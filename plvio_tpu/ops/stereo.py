"""Rectified stereo matching as a batched device op.

Re-design of `Frame::ComputeStereoMatches` (reference: src/Frame.cc:1228 —
per-row candidate lists, SAD refinement, disparity checks) as one gated
Hamming-matmul: row gate |v_L - v_R| <= tol x scale, disparity gate
0 < d <= max_disp, mutual-NN ratio — then depth = bf / disparity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import matching as M


def match_stereo(uv_l, desc_l, oct_l, valid_l, uv_r, desc_r, oct_r, valid_r,
                 bf: float, min_z: float = 0.1, row_tol: float = 2.0,
                 ratio: float = 0.9, max_dist: float = 60.0):
    """Returns (u_right [N], depth [N], has_depth [N]) for left features.

    bf = baseline * fx.  max disparity = bf / min_z.
    """
    dist = M.hamming_matrix(desc_l, desc_r)
    scale_l = 1.2 ** oct_l.astype(jnp.float32)
    dv = jnp.abs(uv_l[:, 1:2] - uv_r[None, :, 1])
    disp = uv_l[:, 0:1] - uv_r[None, :, 0]
    max_disp = bf / min_z
    gate = (dv <= row_tol * scale_l[:, None]) & (disp > 0.1) & (disp <= max_disp)
    idx, ok = M.match_nn_ratio(dist, valid_l, valid_r, gate,
                               max_dist=max_dist, ratio=ratio, mutual=True)
    u_r = uv_r[idx, 0]
    d = uv_l[:, 0] - u_r
    depth = bf / jnp.maximum(d, 1e-6)
    has = ok & (d > 0.1)
    return jnp.where(has, u_r, -1.0), jnp.where(has, depth, -1.0), has


def backproject(K, uv, depth):
    """Undistorted pixels + depth -> camera-frame 3D [N,3]."""
    x = (uv[:, 0] - K.cx) / K.fx * depth
    y = (uv[:, 1] - K.cy) / K.fy * depth
    return jnp.stack([x, y, depth], -1)
