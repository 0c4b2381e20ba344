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


def match_stereo_lines(ep_l, desc_l, ang_l, valid_l,
                       ep_r, desc_r, ang_r, valid_r,
                       bf: float, min_disp: float = 1.0,
                       overlap_th: float = 0.75,
                       angle_tol: float = 0.1,
                       max_dist: float = 110.0, ratio: float = 0.9):
    """Rectified stereo line matching (reference
    Frame::ComputeStereoMatches_Lines src/Frame.cc:1408): LBD Hamming NN
    gated by direction + vertical-span overlap; per-endpoint disparity by
    intersecting the matched right line at the left endpoint's row
    (:1468-1470); gates: disparity >= min_disp, both segments
    non-horizontal, y-overlap > 0.75 (:1474-1481).

    ep_* [L,4] (x0,y0,x1,y1) pixel endpoints, desc_* [L,256] ±1 LBD
    bits, ang_* [L] segment angles.  Returns (depth_s [L], depth_e [L],
    has [L]): camera depths of both left endpoints (bf = baseline*fx).
    """
    dist = M.hamming_matrix(desc_l, desc_r)
    # direction gate (rectified stereo preserves orientation)
    dang = jnp.abs(ang_l[:, None] - ang_r[None, :]) % jnp.pi
    dang = jnp.minimum(dang, jnp.pi - dang)
    # vertical-span overlap gate (lineSegmentOverlapStereo :1494):
    # fraction of the left segment's y-span covered by the right's
    ylo_l = jnp.minimum(ep_l[:, 1], ep_l[:, 3])[:, None]
    yhi_l = jnp.maximum(ep_l[:, 1], ep_l[:, 3])[:, None]
    ylo_r = jnp.minimum(ep_r[:, 1], ep_r[:, 3])[None, :]
    yhi_r = jnp.maximum(ep_r[:, 1], ep_r[:, 3])[None, :]
    inter = jnp.maximum(0.0, jnp.minimum(yhi_l, yhi_r)
                        - jnp.maximum(ylo_l, ylo_r))
    span_l = jnp.maximum(yhi_l - ylo_l, 1e-6)
    overlap = inter / span_l
    # lines must move left (positive disparity) between views: right-image
    # midpoint x must not exceed left midpoint x
    mid_l = (ep_l[:, 0] + ep_l[:, 2]) * 0.5
    mid_r = (ep_r[:, 0] + ep_r[:, 2]) * 0.5
    gate = (dang < angle_tol * jnp.pi) & (overlap > overlap_th) \
        & (mid_r[None, :] <= mid_l[:, None])
    idx, ok = M.match_nn_ratio(dist, valid_l, valid_r, gate,
                               max_dist=max_dist, ratio=ratio, mutual=True)
    mr = ep_r[idx]                      # matched right endpoints [L,4]
    # x of the right infinite line at row y: x(y) = x0 + (y-y0)*dx/dy
    dy_r = mr[:, 3] - mr[:, 1]
    slope = (mr[:, 2] - mr[:, 0]) / jnp.where(
        jnp.abs(dy_r) < 1e-6, jnp.inf, dy_r)
    x_at = lambda y: mr[:, 0] + (y - mr[:, 1]) * slope
    disp_s = ep_l[:, 0] - x_at(ep_l[:, 1])
    disp_e = ep_l[:, 2] - x_at(ep_l[:, 3])
    horiz_l = jnp.abs(ep_l[:, 1] - ep_l[:, 3]) <= 0.1
    horiz_r = jnp.abs(dy_r) <= 0.1
    has = ok & (disp_s >= min_disp) & (disp_e >= min_disp) \
        & ~horiz_l & ~horiz_r
    depth_s = jnp.where(has, bf / jnp.maximum(disp_s, 1e-6), -1.0)
    depth_e = jnp.where(has, bf / jnp.maximum(disp_e, 1e-6), -1.0)
    return depth_s, depth_e, has


def backproject(K, uv, depth):
    """Undistorted pixels + depth -> camera-frame 3D [N,3]."""
    x = (uv[:, 0] - K.cx) / K.fx * depth
    y = (uv[:, 1] - K.cy) / K.fy * depth
    return jnp.stack([x, y, depth], -1)
