"""Neural equilibrium kernel: O(1) surrogate plant inside a control loop.

Reference parity anchors: ``core/neural_equilibrium_kernel.py:48-294``
(drop-in surrogate kernel for control loops), ``hpc_bridge.py:332-357``
(O(1) lane).  Uses the committed ``neural_equilibrium`` artifact
(129^2, held-out rel-L2 < 0.02 gated below; 6 coil currents -> psi).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.neural_kernel import (
    run_neural_shape_loop,
    soft_axis_position,
)
from scpn_fusion_tpu.models.surrogates.pretrained import (
    _load_artifact,
    load_equilibrium_artifact,
)

_N = int(_load_artifact("neural_equilibrium")[1]["grid"])
R_1D = jnp.linspace(2.0, 10.0, _N)
Z_1D = jnp.linspace(-4.0, 4.0, _N)
BASE_I = jnp.asarray([-1.0, 4.0, 6.0, 4.0, -1.0, 3.0], jnp.float32)


@pytest.fixture(scope="module")
def surrogate():
    sur, metrics = load_equilibrium_artifact()
    assert metrics["test_rel_l2"] < 0.02
    return sur


def test_soft_axis_matches_argmax(surrogate):
    psi = surrogate.predict(BASE_I)
    ax_r, ax_z = soft_axis_position(psi, R_1D, Z_1D)
    iz, ir = np.unravel_index(np.argmax(np.asarray(psi)), psi.shape)
    d_r = float(R_1D[1] - R_1D[0])
    assert abs(float(ax_r) - float(R_1D[ir])) < 2.0 * d_r
    assert abs(float(ax_z) - float(Z_1D[iz])) < 2.0 * d_r


def test_surrogate_axis_responds_to_coils(surrogate):
    """Strengthening the outboard coil set pulls the axis — the surrogate
    carries real coil-to-shape physics, not a constant map."""
    psi0 = surrogate.predict(BASE_I)
    psi1 = surrogate.predict(BASE_I * jnp.asarray([1, 1, 1.3, 1, 1, 1.3],
                                                  jnp.float32))
    r0, _ = soft_axis_position(psi0, R_1D, Z_1D)
    r1, _ = soft_axis_position(psi1, R_1D, Z_1D)
    assert abs(float(r1) - float(r0)) > 0.01


def test_closed_loop_steers_axis_to_target(surrogate):
    """The O(1)-kernel PI loop moves the axis to a shifted radial target
    and holds it (reference claim: surrogate kernel usable for control)."""
    psi0 = surrogate.predict(BASE_I)
    r0, _ = soft_axis_position(psi0, R_1D, Z_1D)
    target = float(r0) + 0.15

    steer = jnp.asarray([0, 0, 1.0, 0, 1.0, 0.0], jnp.float32)
    steer = steer / jnp.linalg.norm(steer)
    trace = run_neural_shape_loop(
        surrogate, BASE_I, R_1D, Z_1D, target_r=target, steer=steer,
        n_ticks=120, kp=2.0, ki=0.2)
    err = np.asarray(trace.err_r)
    assert np.all(np.isfinite(err))
    assert abs(err[-1]) < abs(err[0])
    assert np.mean(np.abs(err[-10:])) < 0.05, np.abs(err[-10:]).mean()


def test_loop_is_solver_free_fast_path(surrogate):
    """Trace structure: 120 ticks return per-tick telemetry with static
    shapes (one compiled program; no per-tick host round trips)."""
    steer = jnp.asarray([0, 0, 1.0, 0, 0, 0.0], jnp.float32)
    trace = run_neural_shape_loop(
        surrogate, BASE_I, R_1D, Z_1D, target_r=6.0, steer=steer,
        n_ticks=120)
    assert trace.axis_r.shape == (120,)
    assert trace.currents.shape == (120, 6)
    assert trace.final_psi.shape == (_N, _N)
