"""Control-room VDE closed-loop tests (reference
``control/fusion_control_room.py`` contract: stabilised displacement,
estimator beats raw measurement, kernel-psi lane, rendered artifacts)."""

import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.control.control_room import (
    render_control_room_report,
    run_control_room_session,
)


class TestSession:
    def test_vde_is_stabilised(self):
        trace, summary = run_control_room_session(steps=200, size=24, seed=42)
        assert float(summary["max_abs_z"]) < 1.5
        assert float(summary["mean_abs_z"]) < 0.5
        # The unstable drift term alone (z *= growth compounding) would run
        # away; bounded max|z| over 200 steps demonstrates active control.
        assert np.any(np.asarray(trace.top_action) > 0.0)
        assert np.any(np.asarray(trace.bottom_action) > 0.0)

    def test_stable_across_seeds(self):
        # The reference's own loop is marginally stable (diverges for
        # default_rng(2)); the exact-linearisation observer + state
        # feedback must hold every seed bounded.
        for seed in (0, 1, 2, 3, 7):
            _, s = run_control_room_session(steps=250, size=16, seed=seed)
            assert float(s["max_abs_z"]) < 1.5, seed

    def test_estimator_beats_raw_measurement(self):
        _, summary = run_control_room_session(steps=300, size=16, seed=7)
        assert float(summary["estimator_rmse"]) < float(
            summary["measurement_rmse"])

    def test_density_frames_shape_and_range(self):
        trace, _ = run_control_room_session(steps=12, size=20, seed=0)
        dens = np.asarray(trace.density)
        assert dens.shape == (12, 20, 20)
        assert dens.min() >= 0.0
        assert 0.5 < dens.max() <= 1.3   # core ~1 plus 5% noise

    def test_push_pull_actions_exclusive(self):
        trace, _ = run_control_room_session(steps=100, size=16, seed=3)
        top = np.asarray(trace.top_action)
        bot = np.asarray(trace.bottom_action)
        assert np.all(top * bot == 0.0)   # one side at a time (tanh split)
        assert np.all((top >= 0) & (top <= 1) & (bot >= 0) & (bot <= 1))

    def test_kernel_psi_lane(self):
        # A kernel-supplied flux map replaces the Miller geometry: density
        # must follow the provided map's topology, not the analytic one.
        size = 16
        x = jnp.linspace(-1, 1, size)
        xx, yy = jnp.meshgrid(x, x)
        psi = (xx + 0.5) ** 2 + yy**2        # off-centre core
        trace, _ = run_control_room_session(
            steps=4, size=size, seed=1, psi_kernel=psi)
        dens = np.asarray(trace.density[-1])
        core = np.unravel_index(np.argmax(dens), dens.shape)
        truth = np.unravel_index(np.argmin(np.asarray(psi)), (size, size))
        assert abs(core[0] - truth[0]) <= 1 and abs(core[1] - truth[1]) <= 1

    def test_deterministic(self):
        t1, s1 = run_control_room_session(steps=50, size=16, seed=9)
        t2, s2 = run_control_room_session(steps=50, size=16, seed=9)
        np.testing.assert_array_equal(np.asarray(t1.z_true),
                                      np.asarray(t2.z_true))


class TestRender:
    def test_report_png_and_gif(self, tmp_path):
        trace, _ = run_control_room_session(steps=8, size=16, seed=2)
        png = tmp_path / "report.png"
        gif = tmp_path / "room.gif"
        res = render_control_room_report(
            trace, str(png), path_gif=str(gif), gif_stride=4)
        assert res["report_saved"] and png.stat().st_size > 0
        assert res["animation_saved"] and gif.stat().st_size > 0
