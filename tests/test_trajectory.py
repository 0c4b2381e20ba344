import numpy as np
import jax.numpy as jnp

from plvio_tpu.io import trajectory as T
from plvio_tpu.io import synthetic as syn
from plvio_tpu.utils import lie


def _traj_from_synth(s: syn.SyntheticTrajectory) -> T.Trajectory:
    q = np.asarray(lie.rot_to_quat(jnp.asarray(s.R_wb, jnp.float32)))
    return T.Trajectory(s.timestamps, s.p_wb, q)


def test_tum_roundtrip(tmp_path):
    s = syn.make_orbit_trajectory(duration=2.0)
    tr = _traj_from_synth(s)
    path = str(tmp_path / "traj.txt")
    T.write_tum(path, tr)
    tr2 = T.read_tum(path)
    np.testing.assert_allclose(tr2.timestamps, tr.timestamps, atol=1e-8)
    np.testing.assert_allclose(tr2.positions, tr.positions, atol=1e-6)


def test_ate_zero_for_identical():
    s = syn.make_orbit_trajectory(duration=3.0)
    tr = _traj_from_synth(s)
    assert T.ate_rmse(tr, tr) < 1e-9


def test_ate_invariant_to_sim3(rng):
    """ATE with alignment must be ~0 when est = sim3 * gt."""
    s = syn.make_orbit_trajectory(duration=3.0)
    gt = _traj_from_synth(s)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.9], jnp.float32)), np.float64)
    scale, t = 2.7, np.array([1.0, -2.0, 0.5])
    est = T.Trajectory(gt.timestamps, (scale * (R @ gt.positions.T)).T + t,
                       gt.quaternions)
    assert T.ate_rmse(est, gt, with_scale=True) < 1e-5
    # noise raises it proportionally
    est2 = T.Trajectory(gt.timestamps,
                        est.positions + rng.normal(0, 0.05, est.positions.shape),
                        gt.quaternions)
    ate = T.ate_rmse(est2, gt, with_scale=True)
    assert 0.02 < ate < 0.2


def test_rpe_zero_for_identical():
    s = syn.make_orbit_trajectory(duration=3.0)
    tr = _traj_from_synth(s)
    assert T.rpe_rmse(tr, tr) < 1e-9


def test_synthetic_render_smoke(rng):
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=80)
    s = syn.make_orbit_trajectory(duration=1.0, radius=0.6)
    img = syn.render_frame(scene, s.R_wb[0], s.p_wb[0], rng=rng)
    assert img.shape == (480, 752)
    assert img.std() > 2.0  # actually textured (sparse blobs on gray bg)
    uv, z, vis, uv_l, vis_l = syn.project_scene(
        scene, s.R_wb[0], s.p_wb[0], 458.654, 457.296, 367.215, 248.375, 752, 480)
    assert vis.sum() > 30
    assert vis_l.sum() > 2
