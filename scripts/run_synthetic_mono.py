"""Run mono point-only SLAM on the synthetic orbit sequence and print ATE.

Debug/benchmark driver for the minimum end-to-end slice (SURVEY §7.1
stage 4).  Usage: python scripts/run_synthetic_mono.py [n_frames]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import jax

if "cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from plvio_tpu.config import SystemConfig, CameraConfig
from plvio_tpu.io import synthetic as syn
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.models.system import System
from plvio_tpu.utils import lie
import jax.numpy as jnp


def main(n_frames: int = 80, verbose: bool = True):
    rng = np.random.default_rng(0)
    scene = syn.make_room_scene(rng, n_points=4000, n_lines=60)
    traj = syn.make_orbit_trajectory(duration=n_frames / 20.0, fps=20.0,
                                     radius=0.6)

    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)))
    slam = System(cfg)

    t0 = time.time()
    n_ok = 0
    for i in range(min(n_frames, len(traj.timestamps))):
        img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
        pose = slam.track_monocular(img, traj.timestamps[i])
        if pose is not None:
            n_ok += 1
        if verbose and i % 10 == 0:
            m = slam.atlas.current
            print(f"frame {i:3d} state={slam.state.name:15s} "
                  f"kf={m.n_kf} pts={m.n_pt} "
                  f"tracked={'yes' if pose is not None else 'no'}")
    dt = time.time() - t0

    est = slam.trajectory()
    q = np.asarray(lie.rot_to_quat(jnp.asarray(traj.R_wb, jnp.float32)))
    gt = TIO.Trajectory(traj.timestamps, traj.p_wb, q)
    ate = TIO.ate_rmse(est, gt, with_scale=True)
    print(f"\nframes tracked: {n_ok}/{n_frames}; map lines: {slam.atlas.current.n_ln}")
    print(f"ATE RMSE (Sim3-aligned): {ate:.4f} m")
    print(f"wall: {dt:.1f}s ({n_frames/dt:.1f} fps incl. host render)")
    return ate


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 80
    main(n)
