from scpn_fusion_tpu.models.transport.solver import (  # noqa: F401
    TransportParams,
    TransportState,
    evolve_profiles,
    initial_state,
    run_transport,
)
from scpn_fusion_tpu.models.transport.momentum_lh import (  # noqa: F401
    LHState,
    MomentumParams,
    evolve_rotation,
    lh_transition_step,
    martin_lh_threshold_mw,
)
