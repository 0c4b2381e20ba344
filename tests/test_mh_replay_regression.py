"""End-to-end accuracy regression on the EuRoC-realism MH replay — a
short slice of scripts/run_mh_replay.py with pinned (relaxed) thresholds:
no terminal tracking loss, the session stays in ONE Atlas map, lines
populate the map, and metric ATE stays bounded (VERDICT r2 #1: the
replay must be a committed, tested result, not a script)."""
import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.config import (SystemConfig, CameraConfig, ImuConfig,
                              Sensor)
from plvio_tpu.io import synthetic as syn
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System
from plvio_tpu.models.tracking import TrackState
from plvio_tpu.utils import lie

IDENTITY_TBC = tuple(np.eye(4).flatten().tolist())


@pytest.mark.slow
def test_mh_replay_short_regression():
    """8 s slice (stationary start + excitation + sweep onset, IMU init
    included): tracks through, stays in one map, metric ATE bounded."""
    duration = 8.0
    rng = np.random.default_rng(7)
    scene = syn.make_hall_scene(rng, n_points=9000, n_lines=500)
    traj = syn.make_mh_trajectory(duration + 0.3, fps=20.0)
    imu = syn.synthesize_imu_mh(rng, duration + 0.3)

    cfg = SystemConfig(sensor=Sensor.IMU_MONOCULAR,
                       camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       imu=ImuConfig(Tbc=IDENTITY_TBC))
    slam = System(cfg)

    n_frames = len(traj.timestamps)
    n_ok = 0
    last_t = None
    for i in range(n_frames):
        t = traj.timestamps[i]
        img = syn.render_frame_realistic(scene, syn._eval_mh, t, rng)
        if last_t is None:
            batch = None
        else:
            sel = (imu.timestamps > last_t) & (imu.timestamps <= t)
            ts = imu.timestamps[sel]
            dts = np.diff(np.concatenate([[last_t], ts]))
            batch = (imu.gyro[sel], imu.acc[sel], dts)
        pose = slam.track_monocular(img, t, imu=batch)
        last_t = t
        n_ok += pose is not None

    m = slam.atlas.current
    # IMU must have initialized without the degenerate bias/scale trade
    assert m.imu_initialized
    assert np.linalg.norm(slam.tracker.frame_ba) < 0.5
    # no terminal loss: single Atlas map, tracker not LOST at the end
    assert len(slam.atlas.maps) == 1
    assert slam.state != TrackState.LOST
    # >=85% of frames emit poses (the untracked ones are the pre-init
    # stationary prefix that no mono system can track)
    assert n_ok >= 0.85 * n_frames, f"{n_ok}/{n_frames}"
    assert int(m.ln_valid.sum()) >= 20

    slam.global_refine()
    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate_sim3 = TIO.ate_rmse(est, gt, with_scale=True)
    ate_se3 = TIO.ate_rmse(est, gt, with_scale=False)
    # relaxed gates (current state ~0.2-0.9 m on 12 s; 8 s is easier) —
    # pin against gross regressions, tighten as accuracy improves
    assert ate_sim3 < 0.6, f"ATE Sim3 {ate_sim3:.3f} m"
    assert ate_se3 < 1.0, f"ATE SE3 {ate_se3:.3f} m"
