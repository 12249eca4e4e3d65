from scpn_fusion_tpu.scpn.structure import StochasticPetriNet  # noqa: F401
from scpn_fusion_tpu.scpn.controller import (  # noqa: F401
    CompiledController,
    ControllerConfig,
    ControllerState,
    controller_step,
    initial_controller_state,
    run_controller,
)
from scpn_fusion_tpu.scpn.proof_manifest import (  # noqa: F401
    build_proof_manifest,
    verify_manifest_matches,
)
from scpn_fusion_tpu.scpn.contracts import (  # noqa: F401
    DEFAULT_INVARIANTS,
    DEFAULT_SAFETY_CONTRACTS,
    PhysicsInvariant,
    SafetyContract,
    check_all,
    check_invariant,
    check_invariants_compiled,
    invariant_table,
    should_trigger_mitigation,
    verify_safety_contracts,
)
