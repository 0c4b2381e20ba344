"""Production multi-device dispatch: with PLVIO_DIST=1 the live
mono-inertial pipeline routes every LIBA/VIBA window solve through the
exact landmark-sharded distributed solver (parallel/dist_liba) on the
virtual 8-device CPU mesh — the same code path a real TPU mesh
dispatches automatically (models/local_mapping.LocalMapper.__init__).
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.config import (SystemConfig, CameraConfig, ImuConfig,
                              Sensor)
from plvio_tpu.io import synthetic as syn
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System
from plvio_tpu.utils import lie

IDENTITY_TBC = tuple(np.eye(4).flatten().tolist())


@pytest.mark.slow
def test_vi_session_runs_on_dist_backend(rng, monkeypatch):
    monkeypatch.setenv("PLVIO_DIST", "1")
    dur, fps = 9.0, 10.0
    scene = syn.make_room_scene(rng, n_points=3000, n_lines=120)
    traj = syn.make_orbit_trajectory(duration=dur, fps=fps, radius=0.8)
    imu = syn.synthesize_imu(rng, dur)

    cfg = SystemConfig(sensor=Sensor.IMU_MONOCULAR,
                       camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       imu=ImuConfig(Tbc=IDENTITY_TBC))
    slam = System(cfg)
    assert slam.mapper._dist_runner is not None, \
        "PLVIO_DIST=1 must activate the distributed back end"

    n_frames = len(traj.timestamps)
    n_ok = 0
    last_t = None
    for i in range(n_frames):
        t = traj.timestamps[i]
        img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
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

    assert n_ok >= 0.85 * n_frames, f"{n_ok}/{n_frames}"
    # the sharded solver actually ran (compiled at least one bucket)
    if slam.atlas.current.imu_initialized:
        assert len(slam.mapper._dist_runner._cache) >= 1
    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate = TIO.ate_rmse(est, gt, with_scale=True)
    assert ate < 0.1, f"ATE {ate:.3f} m"
