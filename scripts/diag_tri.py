"""Inspect why line triangulation gates reject matched pairs."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from plvio_tpu.config import SystemConfig, CameraConfig
from plvio_tpu.io import synthetic as syn
from plvio_tpu.models.system import System

n_frames = 30
rng = np.random.default_rng(0)
scene = syn.make_room_scene(rng, n_points=4000, n_lines=60)
traj = syn.make_orbit_trajectory(duration=n_frames / 20.0, fps=20.0,
                                 radius=0.6)
cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)))
slam = System(cfg)
mapper = slam.mapper
m = slam.atlas.current
K = mapper.K

orig_tri = mapper.line_triangulate

def tri_debug(pose1, pose2, ep1, ep2, valid, **kw):
    Xs, Xe, good = orig_tri(pose1, pose2, ep1, ep2, valid, **kw)
    v = np.asarray(valid)
    if v.sum() == 0:
        return Xs, Xe, good
    pose1, pose2, ep1, ep2 = map(np.asarray, (pose1, pose2, ep1, ep2))
    R1, t1 = pose1[:, :3], pose1[:, 3]
    R2, t2 = pose2[:, :3], pose2[:, 3]
    C1, C2 = -R1.T @ t1, -R2.T @ t2
    print(f"   baseline={np.linalg.norm(C2-C1):.3f}")
    rs2 = np.stack([(ep2[:, 0] - K.cx) / K.fx, (ep2[:, 1] - K.cy) / K.fy,
                    np.ones(len(ep2))], -1)
    re2 = np.stack([(ep2[:, 2] - K.cx) / K.fx, (ep2[:, 3] - K.cy) / K.fy,
                    np.ones(len(ep2))], -1)
    n_w = np.cross(rs2, re2) @ R2
    n_hat = n_w / np.maximum(np.linalg.norm(n_w, axis=-1, keepdims=True), 1e-9)
    mid = (ep1[:, :2] + ep1[:, 2:]) / 2
    d1 = np.stack([(mid[:, 0] - K.cx) / K.fx, (mid[:, 1] - K.cy) / K.fy,
                   np.ones(len(ep1))], -1) @ R1
    denom = np.abs(np.sum(n_hat * d1, -1))
    Xs, Xe = np.asarray(Xs), np.asarray(Xe)
    seg = np.linalg.norm(Xe - Xs, axis=-1)
    z1s = (Xs @ R1.T + t1)[:, 2]
    z1e = (Xe @ R1.T + t1)[:, 2]
    for i in np.nonzero(v)[0][:8]:
        print(f"   pair {i}: denom={denom[i]:.4f} seg={seg[i]:.3f} "
              f"z_s={z1s[i]:.2f} z_e={z1e[i]:.2f} good={bool(np.asarray(good)[i])}")
    return Xs, Xe, good

mapper.line_triangulate = tri_debug

for i in range(n_frames):
    img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
    slam.track_monocular(img, traj.timestamps[i])
