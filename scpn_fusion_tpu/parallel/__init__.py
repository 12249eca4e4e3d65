from scpn_fusion_tpu.parallel.halo import (  # noqa: F401
    make_z_mesh,
    sharded_sor_solve,
)
from scpn_fusion_tpu.parallel.sharded_fb import (  # noqa: F401
    solve_free_boundary_sharded,
)
from scpn_fusion_tpu.parallel.sharded_solve import (  # noqa: F401
    solve_equilibrium_sharded,
    solve_equilibrium_sharded_fmg,
)
