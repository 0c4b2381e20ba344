"""End-to-end monocular point-only SLAM on the synthetic sequence —
the deterministic regression test with an ATE threshold that SURVEY §4
prescribes (the reference's only 'tests' were manual dataset runs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.config import SystemConfig, CameraConfig
from plvio_tpu.io import synthetic as syn
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System
from plvio_tpu.utils import lie


@pytest.mark.slow
def test_mono_synthetic_ate(rng):
    n_frames = 30
    # 200 scene lines -> a handful visible per frame; the detector merges
    # fragments into long segments, so map-line counts are small but the
    # lines are real (quality over fragment-count)
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=200)
    traj = syn.make_orbit_trajectory(duration=n_frames / 20.0, fps=20.0,
                                     radius=0.6)
    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)))
    slam = System(cfg)

    n_ok = 0
    for i in range(n_frames):
        img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
        pose = slam.track_monocular(img, traj.timestamps[i])
        n_ok += pose is not None

    assert n_ok >= n_frames - 5, f"only {n_ok}/{n_frames} frames tracked"

    # the point+line pipeline must actually populate the map with lines:
    # detection -> collinear merge -> pair matching -> interpretation-
    # plane triangulation -> culling survival
    m = slam.atlas.current
    n_lines = int(m.ln_valid.sum())
    assert n_lines >= 3, f"only {n_lines} map lines survived"
    # and they are repeatedly re-observed by tracking (found stats grow)
    assert int(m.ln_found[m.ln_valid].sum()) >= 2 * n_lines

    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate = TIO.ate_rmse(est, gt, with_scale=True)
    assert ate < 0.05, f"ATE {ate:.4f} m"

    # trajectory saving round-trips
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        slam.save_trajectory(os.path.join(d, "CameraTrajectory.txt"))
        slam.save_keyframe_trajectory(os.path.join(d, "KeyFrameTrajectory.txt"))
        t2 = TIO.read_tum(os.path.join(d, "CameraTrajectory.txt"))
        assert len(t2) == len(est)
