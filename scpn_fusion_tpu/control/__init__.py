from scpn_fusion_tpu.control.actuator import (  # noqa: F401
    ActuatorParams,
    ActuatorState,
    actuator_init,
    actuator_step,
)
from scpn_fusion_tpu.control.pid import PIDGains, PIDState, pid_init, pid_step  # noqa: F401
from scpn_fusion_tpu.control.flight_sim import (  # noqa: F401
    FlightSimParams,
    run_shot_reduced,
)
