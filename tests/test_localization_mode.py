"""Localization-only mode (reference System::ActivateLocalizationMode
include/System.h:126-128): the map is frozen — tracking continues against
existing landmarks, but no keyframes or landmarks are created."""
import numpy as np
import pytest

from plvio_tpu.config import SystemConfig, CameraConfig
from plvio_tpu.io import synthetic as syn
from plvio_tpu.models.system import System


@pytest.mark.slow
def test_localization_mode_freezes_map(rng):
    n_build, n_loc = 20, 10
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=60)
    traj = syn.make_orbit_trajectory(duration=(n_build + n_loc) / 20.0,
                                     fps=20.0, radius=0.6)
    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)))
    slam = System(cfg)

    for i in range(n_build):
        img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
        slam.track_monocular(img, traj.timestamps[i])

    m = slam.atlas.current
    n_kf_before = m.n_kf
    n_pt_before = m.n_pt
    assert n_kf_before >= 2

    slam.activate_localization_mode()
    n_ok = 0
    for i in range(n_build, n_build + n_loc):
        img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
        pose = slam.track_monocular(img, traj.timestamps[i])
        n_ok += pose is not None

    m = slam.atlas.current
    assert m.n_kf == n_kf_before, "localization mode inserted keyframes"
    assert m.n_pt == n_pt_before, "localization mode created landmarks"
    assert n_ok >= n_loc - 2, f"only {n_ok}/{n_loc} frames localized"

    # resuming SLAM maps again
    slam.deactivate_localization_mode()
    for i in range(3):
        img = syn.render_frame(scene, traj.R_wb[n_build + n_loc - 1],
                               traj.p_wb[n_build + n_loc - 1], rng=rng)
        slam.track_monocular(img, traj.timestamps[-1] + 0.05 * (i + 1))
    assert slam.tracker.only_tracking is False
