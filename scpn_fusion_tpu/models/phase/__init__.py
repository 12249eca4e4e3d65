from scpn_fusion_tpu.models.phase.kuramoto import (  # noqa: F401
    kuramoto_sakaguchi_step,
    lyapunov_exponent,
    lyapunov_v,
    order_parameter,
    run_kuramoto,
    wrap_phase,
)
from scpn_fusion_tpu.models.phase.upde import UPDESpec, run_upde, upde_tick  # noqa: F401
