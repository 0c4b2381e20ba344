"""Diagnose the line pipeline yield: detected -> free -> matched ->
triangulated -> created, per keyframe, on the synthetic room scene."""
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
from plvio_tpu.models import local_mapping as LM

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60

rng = np.random.default_rng(0)
scene = syn.make_room_scene(rng, n_points=4000, n_lines=200)
traj = syn.make_orbit_trajectory(duration=n_frames / 20.0, fps=20.0,
                                 radius=0.6)

cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)))
slam = System(cfg)

# instrument create_new_lines
orig_pair = None
mapper = slam.mapper

orig_create = mapper.create_new_lines

def create_instrumented(kf):
    m = mapper.map
    det = int(m.kf_line_valid[kf].sum())
    free = int((m.kf_line_valid[kf] & (m.kf_match_ln[kf] == -1)).sum())
    nbs = m.covisible_kfs(kf, n=5, min_weight=5)
    n_before = m.n_ln
    # re-run the body with stage counts
    stats = dict(matched=0, tri=0)
    pair = mapper.line_pair_match
    tri = mapper.line_triangulate

    def pm(*a, **k):
        idx, ok = pair(*a, **k)
        stats['matched'] += int(np.asarray(ok).sum())
        return idx, ok

    def tr(*a, **k):
        Xs, Xe, good = tri(*a, **k)
        stats['tri'] += int(np.asarray(good).sum())
        return Xs, Xe, good

    mapper.line_pair_match = pm
    mapper.line_triangulate = tr
    try:
        orig_create(kf)
    finally:
        mapper.line_pair_match = pair
        mapper.line_triangulate = tri
    print(f"  kf={kf} nbs={len(nbs)} det={det} free={free} "
          f"matched={stats['matched']} tri={stats['tri']} "
          f"created={m.n_ln - n_before} total_ln={m.n_ln}")

mapper.create_new_lines = create_instrumented

for i in range(min(n_frames, len(traj.timestamps))):
    img = syn.render_frame(scene, traj.R_wb[i], traj.p_wb[i], rng=rng)
    pose = slam.track_monocular(img, traj.timestamps[i])
    lf = slam.tracker._frame_lines
    nd = int(np.asarray(lf.valid).sum()) if lf is not None else -1
    if i % 5 == 0:
        m = slam.atlas.current
        print(f"frame {i:3d} state={slam.state.name:12s} det_lines={nd} "
              f"kf={m.n_kf} ln={m.n_ln} "
              f"ln_alive={int(m.ln_valid.sum())}")

m = slam.atlas.current
print("final map lines:", int(m.ln_valid.sum()), "n_ln ever:", m.n_ln)
print("ln_found:", m.ln_found[m.ln_valid][:20])
print("ln_visible:", m.ln_visible[m.ln_valid][:20])
