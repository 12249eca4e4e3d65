from scpn_fusion_tpu.io.archive import (  # noqa: F401
    MachineProfiles,
    fetch_mdsplus_profiles,
    load_machine_profiles,
    poll_feed,
    save_reference_profiles,
    synthetic_machine_profiles,
)
from scpn_fusion_tpu.io.geqdsk import GEqdsk, read_geqdsk, write_geqdsk  # noqa: F401
from scpn_fusion_tpu.io.imas import (  # noqa: F401
    IdsError,
    equilibrium_to_ids,
    ids_from_json,
    ids_get,
    ids_new,
    ids_put,
    ids_to_equilibrium,
    ids_to_json,
    ids_to_profiles,
    profiles_to_ids,
)
from scpn_fusion_tpu.io.imas_history import (  # noqa: F401
    ids_pulse_to_twin_history,
    ids_to_twin_history,
    twin_history_to_ids,
    twin_history_to_ids_pulse,
    validate_ids_payload_sequence,
    validate_ids_pulse_payload,
)
