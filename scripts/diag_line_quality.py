"""Measure 3D accuracy of created map lines vs the ground-truth scene,
as a function of the triangulation plane-angle gate."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from plvio_tpu.config import SystemConfig, CameraConfig
from plvio_tpu.io import synthetic as syn
from plvio_tpu.models.system import System

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40

rng = np.random.default_rng(0)
scene = syn.make_room_scene(rng, n_points=4000, n_lines=500)
traj = syn.make_orbit_trajectory(duration=n_frames / 20.0, fps=20.0,
                                 radius=0.6)
cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)))
slam = System(cfg)

for i in range(min(n_frames, len(traj.timestamps))):
    img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
    slam.track_monocular(img, traj.timestamps[i])

m = slam.atlas.current
ids = np.nonzero(m.ln_valid)[0]
print(f"map lines: {len(ids)}")

# Sim3 aligning the SLAM world to the GT world (mono scale is free)
from plvio_tpu.io import trajectory as TIO
from plvio_tpu.utils import lie
est = slam.trajectory()
ia, ib = TIO.associate(est.timestamps, traj.timestamps)
s_, R_, t_ = TIO.umeyama(est.positions[ia], traj.p_wb[ib], with_scale=True)

def to_gt(X):
    return s_ * (R_ @ X) + t_

# ground-truth segments
gs = scene.lines[:, 0]
ge = scene.lines[:, 1]


def dist_to_gt(X):
    """Min distance of 3D point X to any GT segment."""
    d = ge - gs
    L2 = np.sum(d * d, -1)
    t = np.sum((X[None] - gs) * d, -1) / np.maximum(L2, 1e-9)
    if '--seg' in sys.argv: t = np.clip(t, 0, 1)
    P = gs + t[:, None] * d
    return np.linalg.norm(P - X[None], axis=-1).min()


errs = []
for li in ids:
    ep = m.ln_ep[li]
    e = 0.5 * (dist_to_gt(to_gt(ep[:3])) + dist_to_gt(to_gt(ep[3:])))
    errs.append(e)
errs = np.array(errs)
print("endpoint err   median %.3f  p90 %.3f  max %.3f" % (
    np.median(errs), np.percentile(errs, 90), errs.max()))
print("found:", m.ln_found[ids][:30])
print("bad lines (>0.2m):", int((errs > 0.2).sum()), "of", len(errs))

# sanity: map-point quality under the same alignment
pts = np.nonzero(m.pt_valid)[0]
sel = np.random.default_rng(0).choice(pts, min(300, len(pts)), replace=False)
Xm = np.stack([to_gt(x) for x in m.pt_xyz[sel]])
from scipy.spatial import cKDTree
tree = cKDTree(scene.points)
d_map, _ = tree.query(Xm)
rand = np.random.default_rng(1).uniform(-3, 3, (300, 3))
d_rand, _ = tree.query(rand)
print("map point->GT nn dist: median %.3f  p90 %.3f" % (np.median(d_map), np.percentile(d_map, 90)))
print("random->GT nn dist   : median %.3f" % np.median(d_rand))
