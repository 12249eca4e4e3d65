from scpn_fusion_tpu.models.physics.fokker_planck_re import (  # noqa: F401
    FokkerPlanckGrid,
    fp_step,
    run_fokker_planck,
)
from scpn_fusion_tpu.models.physics.hall_mhd_pulsed import (  # noqa: F401
    HallMHDPulsedParams,
    run_hall_mhd_pulsed,
    spitzer_resistivity_ohm_m,
    step_hall_mhd_pulsed,
)
