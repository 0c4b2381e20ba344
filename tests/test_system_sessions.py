"""Multi-session System API: change_dataset boundaries and atlas
checkpoint/restore with re-entry by relocalization.

Reference behaviors covered: System::ChangeDataset (multi-sequence
example mains, Examples/Monocular-Inertial/mono_inertial_euroc.cc), the
boost-serialized SaveAtlas/LoadAtlas scaffolding (src/System.cc:115-191,
disabled there, live here), and in-map relocalization after load
(Tracking::Relocalization src/Tracking.cc:5744).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from plvio_tpu.config import SystemConfig, CameraConfig
from plvio_tpu.io import synthetic as syn
from plvio_tpu.models.system import System
from plvio_tpu.models.tracking import TrackState


def _make_world(rng, n_frames):
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=60)
    traj = syn.make_orbit_trajectory(duration=n_frames / 20.0, fps=20.0,
                                     radius=0.6)
    return scene, traj


@pytest.mark.slow
def test_change_dataset_starts_new_map(rng):
    n = 16
    scene, traj = _make_world(rng, 2 * n)
    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)))
    slam = System(cfg)
    for i in range(n):
        img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
        slam.track_monocular(img, traj.timestamps[i])
    n_maps_before = len(slam.atlas.maps)
    kf_before = slam.atlas.current.n_kf
    assert kf_before > 2

    slam.change_dataset()
    assert len(slam.atlas.maps) == n_maps_before + 1
    assert slam.atlas.current.n_kf == 0          # fresh active map
    assert slam.state == TrackState.NO_IMAGES_YET

    # second session initializes a new map in the same Atlas
    ok2 = 0
    for i in range(n, 2 * n):
        img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
        ok2 += slam.track_monocular(img, traj.timestamps[i]) is not None
    assert ok2 >= n - 6, f"second session tracked {ok2}/{n}"
    assert slam.atlas.current.n_kf > 1
    if len(slam.atlas.maps) == n_maps_before:
        # both sessions viewed the same scene, so the loop closer's
        # merge detection legitimately welded the new map back into the
        # first (reference NewDetectCommonRegions merge branch) — the
        # merged map must hold both sessions' keyframes
        assert slam.atlas.current.n_kf > kf_before
        assert slam.loop_closer.n_maps_merged >= 1
    else:
        # no merge: first session's map untouched
        assert slam.atlas.maps[0].n_kf == kf_before


@pytest.mark.slow
def test_save_load_atlas_and_relocalize(rng, tmp_path):
    n = 20
    scene, traj = _make_world(rng, n)
    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)))
    slam = System(cfg)
    frames = []
    for i in range(n):
        img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
        frames.append(img)
        slam.track_monocular(img, traj.timestamps[i])
    assert slam.atlas.current.n_kf > 3
    slam.save_atlas(str(tmp_path / "atlas"))

    # fresh System, load the checkpoint, relocalize on a revisited view
    slam2 = System(cfg)
    slam2.load_atlas(str(tmp_path / "atlas"))
    assert slam2.state == TrackState.LOST
    assert slam2.atlas.current.n_kf == slam.atlas.current.n_kf

    reloc = False
    for i in range(4, n):
        pose = slam2.track_monocular(frames[i], traj.timestamps[i] + 100.0)
        if pose is not None:
            reloc = True
            # relocalized pose must match the original session's KF frame
            m = slam2.atlas.current
            kfs = m.valid_kf_indices()
            dt = np.abs(m.kf_timestamp[kfs] - traj.timestamps[i])
            j = kfs[dt.argmin()]
            if dt.min() < 1e-3:
                R_est = pose[:, :3]
                R_kf = m.kf_pose_cw[j, :, :3]
                ang = np.degrees(np.arccos(np.clip(
                    (np.trace(R_est.T @ R_kf) - 1) / 2, -1, 1)))
                assert ang < 5.0, f"relocalized rotation off by {ang:.2f} deg"
            break
    assert reloc, "never relocalized into the loaded atlas"


def test_timestamp_jump_guards(rng):
    """Out-of-order frames are dropped; a large forward gap sends the
    session into a fresh Atlas map instead of tracking across it
    (reference timestamp guards, src/Tracking.cc:2226-2252)."""
    from plvio_tpu.io import synthetic as syn
    from plvio_tpu.models.system import System
    from plvio_tpu.config import SystemConfig, CameraConfig

    scene = syn.make_room_scene(rng, n_points=4000, n_lines=60)
    traj = syn.make_orbit_trajectory(duration=2.0, fps=20.0, radius=0.6)
    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       use_lines=False)
    slam = System(cfg)
    i = 0
    while slam.state.name != "OK" and i < 20:
        img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
        slam.track_monocular(img, traj.timestamps[i])
        i += 1
    assert slam.state.name == "OK"

    # out-of-order: dropped, state unchanged
    img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
    pose = slam.track_monocular(img, traj.timestamps[i] - 5.0)
    assert pose is None
    assert slam.state.name == "OK"

    # big forward gap: elastic recovery into a fresh map
    n_maps_before = len(slam.atlas.maps)
    pose = slam.track_monocular(img, traj.timestamps[i] + 10.0)
    assert pose is None
    assert len(slam.atlas.maps) >= n_maps_before  # young-map reset or new map
    assert slam.state.name in ("LOST", "NOT_INITIALIZED", "NO_IMAGES_YET")


def test_export_map_viewer_files(rng, tmp_path):
    """The offline viewer exports (reference Viewer/MapDrawer analog)
    produce loadable PLY / HTML / JSON snapshots of a live map."""
    import json
    from plvio_tpu.io import synthetic as syn
    from plvio_tpu.models.system import System
    from plvio_tpu.config import SystemConfig, CameraConfig

    scene = syn.make_room_scene(rng, n_points=4000, n_lines=200)
    traj = syn.make_orbit_trajectory(duration=1.0, fps=20.0, radius=0.6)
    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)))
    slam = System(cfg)
    for i in range(20):
        img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
        slam.track_monocular(img, traj.timestamps[i])
    assert slam.atlas.current.n_pt > 50

    prefix = str(tmp_path / "map")
    slam.export_map(prefix)
    # PLY parses: header + as many vertices as declared
    with open(prefix + ".ply") as f:
        txt = f.read()
    assert txt.startswith("ply")
    n_vert = int([l for l in txt.splitlines()
                  if l.startswith("element vertex")][0].split()[-1])
    assert n_vert >= slam.atlas.current.n_pt
    # JSON snapshot holds the map
    with open(prefix + ".json") as f:
        snap = json.load(f)
    assert len(snap["points"]) == slam.atlas.current.n_pt
    # HTML is self-contained
    with open(prefix + ".html") as f:
        html = f.read()
    assert "<html" in html.lower()
