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
from scpn_fusion_tpu.models.physics.disruption_sequence import (  # noqa: F401
    DisruptionParams,
    run_disruption_sequence,
    spi_mitigation_scan,
    structural_response_screen,
)
from scpn_fusion_tpu.models.physics.edge_events import (  # noqa: F401
    blob_transport,
    marfe_onset,
    pellet_ablation,
)
from scpn_fusion_tpu.models.physics.fast_ions import (  # noqa: F401
    EnsembleStats,
    coulomb_log_ei,
    critical_velocity,
    first_orbit_loss,
    follow_ensemble,
    heating_partition,
    sample_fast_ion_birth,
    slowing_down_time,
    tau_spitzer_electron,
    tokamak_field,
)
from scpn_fusion_tpu.models.physics.mhd_modes import (  # noqa: F401
    delta_prime_cylindrical,
    locked_mode_evolution,
    mrti_growth_rate,
    rutherford_island_evolution,
    tae_stability,
)
from scpn_fusion_tpu.models.physics.design_scan import (  # noqa: F401
    DesignLimits,
    compact_reactor_search,
    evaluate_design,
    scan_designs,
)
from scpn_fusion_tpu.models.physics.integrated_scenario import (  # noqa: F401
    ScenarioMachine,
    run_shot,
)
from scpn_fusion_tpu.models.physics.sandpile import (  # noqa: F401
    SandpileConfig,
    avalanche_statistics,
    run_sandpile,
)
from scpn_fusion_tpu.models.physics.quasi3d import (  # noqa: F401
    build_divertor_profiles,
    calibrate_tbr_with_erosion,
    hall_mhd_zonal_ratio,
    jet_solps_reference_profile,
    quasi_3d_force_balance,
    solve_quasi_3d_force_residual,
    two_fluid_temhd_coupled_profile,
)
from scpn_fusion_tpu.models.physics.drift_wave import (  # noqa: F401
    DriftWaveConfig,
    DriftWaveState,
    default_probe_indices,
    simulate_probes,
)
from scpn_fusion_tpu.models.physics.frc_stability import (  # noqa: F401
    TiltModeReport,
    TiltTrajectory,
    s_parameter as frc_s_parameter,
    tilt_mode_report,
    tilt_mode_stable,
    tilt_trajectory_from_compression,
    validate_rigid_rotor,
)
from scpn_fusion_tpu.models.physics.faraday_recovery import (  # noqa: F401
    FaradayRecoveryReport,
    faraday_back_emf,
    faraday_recovery,
    integrated_recovery_energy,
    recovery_from_compression,
)
