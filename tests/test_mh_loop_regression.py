"""End-to-end loop-closure regression on the EuRoC-realism CLOSED
CIRCUIT (scripts/run_mh_loop.py): a full orbit of the machine hall that
returns to its starting view, so loop closing runs on realistic imagery
(motion blur, exposure jitter, sensor noise, 200 Hz IMU) — not on
hand-built synthetic geometry (VERDICT r3 missing #1).

Pins: the near-wall fast-flow arcs are survived (the t~9 s loss fixed by
the reference-parity triangulation parallax gate), the session stays in
ONE Atlas map, at least one loop fires at the revisit (reference
NewDetectCommonRegions -> CorrectLoopWithLines -> GBA,
src/LoopClosing.cc:460/1212/3685), and metric ATE stays bounded."""
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
def test_mh_loop_closes_on_realistic_imagery():
    """28 s orbit: revisit reached tracked, loop detected + corrected,
    post-refine metric ATE bounded."""
    duration = 28.0
    rng = np.random.default_rng(7)
    scene = syn.make_hall_scene(rng, n_points=9000, n_lines=500)
    t_frames = np.arange(0.0, duration, 1.0 / 20.0)
    traj = syn._eval_mh_loop(t_frames)
    imu = syn.synthesize_imu_mh(rng, duration + 0.3,
                                eval_fn=syn._eval_mh_loop)

    cfg = SystemConfig(sensor=Sensor.IMU_MONOCULAR,
                       camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       imu=ImuConfig(Tbc=IDENTITY_TBC))
    slam = System(cfg)

    n_frames = len(traj.timestamps)
    n_ok = 0
    last_t = None
    for i in range(n_frames):
        t = traj.timestamps[i]
        img = syn.render_frame_realistic(scene, syn._eval_mh_loop, t, rng)
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
    assert m.imu_initialized
    # the near-wall arcs and the revisit are all tracked in ONE map
    assert len(slam.atlas.maps) == 1
    assert slam.state != TrackState.LOST
    assert n_ok >= 0.85 * n_frames, f"{n_ok}/{n_frames}"
    # the revisit fired loop closure on realistic imagery
    assert slam.loop_closer.n_loops_closed >= 1

    slam.global_refine()
    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate_sim3 = TIO.ate_rmse(est, gt, with_scale=True)
    ate_se3 = TIO.ate_rmse(est, gt, with_scale=False)
    assert ate_sim3 < 0.5, f"ATE Sim3 {ate_sim3:.3f} m"
    assert ate_se3 < 0.7, f"ATE SE3 {ate_se3:.3f} m"
