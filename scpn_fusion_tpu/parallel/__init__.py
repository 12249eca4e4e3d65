from scpn_fusion_tpu.parallel.halo import (  # noqa: F401
    make_z_mesh,
    sharded_sor_solve,
)
