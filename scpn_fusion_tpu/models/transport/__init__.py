from scpn_fusion_tpu.models.transport.solver import (  # noqa: F401
    TransportParams,
    TransportState,
    evolve_profiles,
    initial_state,
    run_transport,
)
