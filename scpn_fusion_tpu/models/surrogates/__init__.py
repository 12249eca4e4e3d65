from scpn_fusion_tpu.models.surrogates.mlp import (  # noqa: F401
    MLPParams,
    init_mlp,
    mlp_apply,
    train_mlp,
)
from scpn_fusion_tpu.models.surrogates.fno import (  # noqa: F401
    FNOParams,
    fno_apply,
    init_fno,
    train_fno,
)
from scpn_fusion_tpu.models.surrogates.equilibrium_surrogate import (  # noqa: F401
    EquilibriumSurrogate,
    train_equilibrium_surrogate,
)
from scpn_fusion_tpu.models.surrogates.esn import (  # noqa: F401
    ESNParams,
    ESNReadout,
    fit_esn,
    init_esn,
    predict_closed_loop,
    trust_horizon,
)
