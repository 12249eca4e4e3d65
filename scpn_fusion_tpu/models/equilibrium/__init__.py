from scpn_fusion_tpu.models.equilibrium.fixed_boundary import (  # noqa: F401
    EquilibriumResult,
    solve_equilibrium,
)
from scpn_fusion_tpu.models.equilibrium.vacuum import vacuum_psi  # noqa: F401
