"""End-to-end Atlas elastic recovery + map merge through the System API:
track a synthetic orbit, black out the camera long enough to go LOST (a
fresh map is created, reference CreateMapInAtlas src/Tracking.cc:3350),
then resume looking at ALREADY-MAPPED territory, and require loop
closing to merge the young map back into the original one (reference
MergeLocal, src/LoopClosing.cc:2448)."""
import numpy as np
import pytest
import jax.numpy as jnp

from plvio_tpu.config import SystemConfig, CameraConfig, TrackingConfig
from plvio_tpu.io import synthetic as syn
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System
from plvio_tpu.utils import lie


def _revisit_script(fps=20.0):
    """Frame script: 4.8 s forward arc, 0.75 s blackout, then 2 s
    REVISITING the arc that starts at t=0.4 s (the camera 'teleports'
    back while the tracker is lost — it cannot tell, it only sees
    images).  Returns (timestamps, pose_times, blackout_mask).

    The forward arc must leave a MATURE map (>10 KFs) at the blackout:
    the reference keeps a map and starts a new one only above 10 KFs
    (CreateMapInAtlas vs ResetActiveMap, src/Tracking.cc:2404) — below
    that, losing tracking legitimately resets in place and there is
    nothing to merge.  The round-4 triangulation-gate tightening slowed
    the mono KF cadence to ~9 KFs per 3.2 s, silently flipping this
    scenario onto the reset path."""
    t_fwd = np.arange(0.0, 4.8, 1.0 / fps)
    n_black = 15
    t_rev = np.arange(0.4, 2.4, 1.0 / fps)
    pose_times = np.concatenate([
        t_fwd,
        np.full(n_black, t_fwd[-1]),        # pose irrelevant (black frames)
        t_rev])
    n = len(pose_times)
    timestamps = np.arange(n) / fps
    black = np.zeros(n, bool)
    black[len(t_fwd):len(t_fwd) + n_black] = True
    return timestamps, pose_times, black


@pytest.mark.slow
def test_lost_then_merge(rng):
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=0)
    timestamps, pose_times, black = _revisit_script()
    traj = syn._eval_orbit(pose_times, radius=0.6, height_amp=0.3,
                           omega=0.45)

    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       use_lines=False,
                       tracking=TrackingConfig(recently_lost_s=0.5))
    slam = System(cfg)

    n = len(timestamps)
    n_maps_seen = set()
    for i in range(n):
        if black[i]:
            img = np.zeros((480, 752), np.float32)
        else:
            img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i],
                                   rng=rng)
        slam.track_monocular(img, timestamps[i])
        n_maps_seen.add(len(slam.atlas.maps))

    assert 2 in n_maps_seen, "blackout never created a second map"
    assert slam.loop_closer.n_maps_merged >= 1, "maps were never merged"
    assert len(slam.atlas.maps) == 1

    # the merged trajectory must align with ground truth end to end:
    # ATE computed against the PLAYED poses at the played timestamps
    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(timestamps[~black], traj.p_wb[~black], q[~black])
    est_t = est.timestamps
    assert est_t.shape[0] > 0.6 * n
    ate = TIO.ate_rmse(est, gt, with_scale=True)
    assert ate < 0.06, f"post-merge ATE {ate:.3f} m"
