"""Concurrent tracker/mapper semantics (reference: 4-thread pipeline
with queues + Map::mMutexMapUpdate, src/System.cc:196-232).

Our async mode runs LocalMapping(+LoopClosing) on a mapper thread fed by
a keyframe queue; safety comes from the System.map_lock discipline: the
tracker holds it for the map-touching back half of each frame (the
reference holds mMutexMapUpdate for the whole back half of
TrackWithLines, src/Tracking.cc:2283), the mapper holds it per
process_keyframe.  Extraction runs outside the lock — the overlap.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.config import SystemConfig, CameraConfig
from plvio_tpu.io import synthetic as syn
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System
from plvio_tpu.utils import lie


@pytest.mark.slow
def test_async_mapping_tracks_and_stays_consistent(rng):
    n_frames = 25
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=200)
    traj = syn.make_orbit_trajectory(duration=n_frames / 20.0, fps=20.0,
                                     radius=0.6)
    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)))
    slam = System(cfg, async_mapping=True)

    n_ok = 0
    try:
        for i in range(n_frames):
            img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i],
                                   rng=rng)
            pose = slam.track_monocular(img, traj.timestamps[i])
            n_ok += pose is not None
    finally:
        slam.shutdown()

    assert n_ok >= n_frames - 6, f"only {n_ok}/{n_frames} tracked async"

    # the map is structurally consistent after the mapper thread drains:
    # every bound observation refers to a valid landmark, counts agree
    m = slam.atlas.current
    for kf in m.valid_kf_indices():
        bound = m.kf_match_pt[kf]
        ok = bound >= 0
        assert m.pt_valid[bound[ok]].all(), "dangling point observation"
    assert m.n_kf == int(m.kf_valid.sum())
    assert m.n_pt == int(m.pt_valid.sum())

    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate = TIO.ate_rmse(est, gt, with_scale=True)
    assert ate < 0.08, f"async ATE {ate:.4f} m"
