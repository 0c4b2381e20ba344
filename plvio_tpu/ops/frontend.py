"""ORB-style point front end as one fused XLA program.

Re-design of `ORBextractor` (reference: src/ORBextractor.cc, 1179 LoC):
same pipeline — 8-level x1.2 pyramid, per-cell FAST with ini/min
thresholds, spatially-distributed top-K, IC_Angle orientation, Gaussian
blur + rotated-BRIEF 256-bit descriptors — but expressed as dense
whole-image tensor ops instead of per-pixel C++ loops:

* FAST is 16 shifted-image comparisons + a wrap-around contiguous-arc
  reduction over the whole level at once (VPU-shaped).
* The octree distribution (reference `DistributeOctTree`,
  src/ORBextractor.cc:456) becomes grid-cell non-max suppression: per-cell
  argmax then global top-K per level — same spatial-uniformity goal, fully
  parallel, fixed output shape.
* Orientation/descriptors are batched gathers over the keypoint set.
* The descriptor pattern is our own deterministic Gaussian pair pattern
  (BRIEF recipe sigma = patch/5) — descriptors only ever match against
  each other inside this system, so OpenCV bit-compat is not needed.

Everything below is static-shape; the whole extractor jit-compiles once
per image geometry.
"""
from __future__ import annotations

import functools
import math
from typing import List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# FAST circle offsets (radius 3 Bresenham circle, standard FAST-16 order)
_CIRCLE = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3)],
    np.int32)

PATCH_R = 15          # orientation patch radius (reference HALF_PATCH_SIZE)
EDGE = 19             # border margin (reference EDGE_THRESHOLD)
DESC_BITS = 256


class LevelSpec(NamedTuple):
    height: int
    width: int
    scale: float      # pyramid scale of this level (1.0 at level 0)
    n_keep: int       # features to keep at this level


class Features(NamedTuple):
    """Fixed-capacity per-frame feature set (the Frame analog)."""
    uv: jnp.ndarray        # [N,2] level-0 pixel coords (raw/distorted)
    uv_und: jnp.ndarray    # [N,2] undistorted pixel coords
    response: jnp.ndarray  # [N]
    angle: jnp.ndarray     # [N] degrees [0,360)
    octave: jnp.ndarray    # [N] int32 pyramid level
    desc: jnp.ndarray      # [N,256] bfloat16 in {-1,+1}
    valid: jnp.ndarray     # [N] bool


def features_per_level(n_features: int, n_levels: int, scale: float) -> List[int]:
    """Geometric feature budget per level (reference ORBextractor ctor,
    src/ORBextractor.cc:430-451)."""
    factor = 1.0 / scale
    n_first = n_features * (1 - factor) / (1 - factor ** n_levels)
    out, total = [], 0
    for i in range(n_levels - 1):
        k = int(round(n_first * factor ** i))
        out.append(k)
        total += k
    out.append(max(n_features - total, 0))
    return out


def make_level_specs(height: int, width: int, n_features: int = 1000,
                     n_levels: int = 8, scale: float = 1.2) -> List[LevelSpec]:
    per = features_per_level(n_features, n_levels, scale)
    specs = []
    for lv in range(n_levels):
        s = scale ** lv
        h = int(round(height / s))
        w = int(round(width / s))
        specs.append(LevelSpec(h, w, s, per[lv]))
    return specs


# --------------------------------------------------------------------------
# Pyramid
# --------------------------------------------------------------------------

def build_pyramid(img: jnp.ndarray, specs: List[LevelSpec]) -> List[jnp.ndarray]:
    """[H,W] float32 -> list of per-level images (bilinear, like cv::resize
    in reference ComputePyramid, src/ORBextractor.cc:958)."""
    out = [img]
    for spec in specs[1:]:
        out.append(jax.image.resize(out[-1], (spec.height, spec.width),
                                    method="linear"))
    return out


# --------------------------------------------------------------------------
# FAST + score + NMS  (whole-level dense computation)
# --------------------------------------------------------------------------

def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift with zero padding so border pixels never fire."""
    H, W = img.shape
    pad = jnp.pad(img, ((3, 3), (3, 3)))
    return jax.lax.dynamic_slice(pad, (3 + dy, 3 + dx), (H, W))


def fast_response(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-16/9 corner response.

    Returns [H,W] float32 response (0 where not a corner).  Score is the
    OpenCV-style sum of |p_i - c| - t over the darker/brighter arc
    (reference uses cv::FAST scores for octree ordering).
    """
    c = img
    neigh = jnp.stack([_shift2d(img, int(dy), int(dx)) for dx, dy in _CIRCLE])
    diff = neigh - c[None]                      # [16,H,W]
    brighter = diff > threshold
    darker = diff < -threshold

    def has_arc9(bits):
        # wrap-around contiguous run >= 9: AND of 9 rotations
        acc = bits
        rolled = bits
        for _ in range(8):
            rolled = jnp.roll(rolled, -1, axis=0)
            acc = acc & rolled
        return jnp.any(acc, axis=0)

    is_corner = has_arc9(brighter) | has_arc9(darker)
    score_b = jnp.sum(jnp.maximum(diff - threshold, 0.0), axis=0)
    score_d = jnp.sum(jnp.maximum(-diff - threshold, 0.0), axis=0)
    score = jnp.maximum(score_b, score_d)
    return jnp.where(is_corner, score, 0.0)


def nms3x3(resp: jnp.ndarray) -> jnp.ndarray:
    """Keep only local maxima in 3x3 windows."""
    m = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.where(resp >= m, resp, 0.0)


def select_grid_topk(resp: jnp.ndarray, k: int, cell: int = 16,
                     border: int = EDGE):
    """Spatially-distributed top-k: per-cell argmax, then global top-k over
    cell winners (the DistributeOctTree analog).

    Returns (xy [k,2] float32 level coords, score [k], valid [k]).
    """
    H, W = resp.shape
    # mask borders
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    ok = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    r = jnp.where(ok, resp, 0.0)

    Hc, Wc = H // cell, W // cell
    rc = r[:Hc * cell, :Wc * cell].reshape(Hc, cell, Wc, cell).transpose(0, 2, 1, 3)
    rc = rc.reshape(Hc * Wc, cell * cell)
    cell_best = jnp.max(rc, axis=1)            # [C]
    cell_arg = jnp.argmax(rc, axis=1)          # [C]

    k = min(k, Hc * Wc)
    top_score, top_cell = jax.lax.top_k(cell_best, k)
    within = cell_arg[top_cell]
    cy = top_cell // Wc
    cx = top_cell % Wc
    y = cy * cell + within // cell
    x = cx * cell + within % cell
    valid = top_score > 0.0
    xy = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return xy, top_score, valid


# --------------------------------------------------------------------------
# Orientation (IC_Angle) — batched patch moments
# --------------------------------------------------------------------------

def _disc_offsets(radius: int) -> np.ndarray:
    offs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dx * dx + dy * dy <= radius * radius:
                offs.append((dy, dx))
    return np.asarray(offs, np.int32)

_DISC = _disc_offsets(PATCH_R)


def ic_angle(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation in degrees (reference IC_Angle,
    src/ORBextractor.cc:75).  xy: [K,2] level coords."""
    H, W = img.shape
    y = jnp.clip(xy[:, 1].astype(jnp.int32), PATCH_R, H - PATCH_R - 1)
    x = jnp.clip(xy[:, 0].astype(jnp.int32), PATCH_R, W - PATCH_R - 1)
    yy = y[:, None] + _DISC[None, :, 0]
    xx = x[:, None] + _DISC[None, :, 1]
    vals = img[yy, xx]                          # [K,|disc|]
    m10 = jnp.sum(vals * _DISC[None, :, 1], axis=1)
    m01 = jnp.sum(vals * _DISC[None, :, 0], axis=1)
    ang = jnp.degrees(jnp.arctan2(m01, m10))
    return jnp.where(ang < 0, ang + 360.0, ang)


# --------------------------------------------------------------------------
# Descriptors: rotated BRIEF with our own deterministic pattern
# --------------------------------------------------------------------------

@functools.lru_cache()
def brief_pattern(seed: int = 7, bits: int = DESC_BITS) -> np.ndarray:
    """[bits, 2, 2] (pair of (x,y) offsets), Gaussian sigma = patch/5,
    clipped to the patch (standard BRIEF recipe; NOT the OpenCV table)."""
    rng = np.random.default_rng(seed)
    sigma = (2 * PATCH_R + 1) / 5.0
    pts = rng.normal(0.0, sigma, (bits, 2, 2))
    return np.clip(pts, -PATCH_R + 1, PATCH_R - 1).astype(np.float32)


def gaussian_blur7(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable 7x7 Gaussian (reference blurs before descriptors,
    src/ORBextractor.cc:1115)."""
    r = 3
    xs = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    k = jnp.asarray(k)
    img4 = img[None, None]
    kh = k.reshape(1, 1, 1, 7)
    kv = k.reshape(1, 1, 7, 1)
    out = jax.lax.conv_general_dilated(img4, kh, (1, 1), "SAME")
    out = jax.lax.conv_general_dilated(out, kv, (1, 1), "SAME")
    return out[0, 0]


def _bilinear(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def brief_descriptors(img_blur: jnp.ndarray, xy: jnp.ndarray,
                      angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Steered BRIEF: rotate the pattern by the keypoint angle, bilinear
    sample, compare (reference computeOrbDescriptor,
    src/ORBextractor.cc:106).  Returns [K,256] bfloat16 in {-1,+1}."""
    pat = jnp.asarray(brief_pattern())          # [256,2,2] (x,y)
    th = jnp.radians(angle_deg)
    ca, sa = jnp.cos(th), jnp.sin(th)           # [K]
    px = pat[None, :, :, 0]                     # [1,256,2]
    py = pat[None, :, :, 1]
    rx = ca[:, None, None] * px - sa[:, None, None] * py
    ry = sa[:, None, None] * px + ca[:, None, None] * py
    xs = xy[:, None, None, 0] + rx              # [K,256,2]
    ys = xy[:, None, None, 1] + ry
    vals = _bilinear(img_blur, ys.reshape(-1), xs.reshape(-1))
    vals = vals.reshape(xs.shape)               # [K,256,2]
    bits = vals[..., 0] < vals[..., 1]
    return (bits.astype(jnp.float32) * 2.0 - 1.0).astype(jnp.bfloat16)


# --------------------------------------------------------------------------
# Full extractor
# --------------------------------------------------------------------------

def extract_orb(img: jnp.ndarray, specs: Tuple[LevelSpec, ...],
                ini_th: float = 20.0, min_th: float = 7.0,
                cell: int = 16) -> Features:
    """The full ORB pipeline on one grayscale image [H,W] float32 [0,255].

    Dual-threshold policy (reference: per-cell retry with minThFAST,
    src/ORBextractor.cc:~300): we run both thresholds densely and take the
    low-threshold response wherever the high one found nothing in a cell —
    expressed as a blend, keeping everything parallel.
    """
    pyr = build_pyramid(img, list(specs))
    all_xy, all_score, all_valid, all_angle, all_oct, all_desc = [], [], [], [], [], []
    for lv, spec in enumerate(specs):
        im = pyr[lv]
        r_hi = nms3x3(fast_response(im, ini_th))
        r_lo = nms3x3(fast_response(im, min_th))
        # blend: prefer high-threshold corners by boosting their score
        resp = jnp.where(r_hi > 0, r_hi + 1e4, r_lo)
        xy, score, valid = select_grid_topk(resp, spec.n_keep, cell)
        ang = ic_angle(im, xy)
        blur = gaussian_blur7(im)
        desc = brief_descriptors(blur, xy, ang)
        all_xy.append(xy * spec.scale)          # to level-0 coords
        all_score.append(jnp.where(score > 1e4, score - 1e4, score))
        all_valid.append(valid)
        all_angle.append(ang)
        all_oct.append(jnp.full(xy.shape[0], lv, jnp.int32))
        all_desc.append(desc)

    uv = jnp.concatenate(all_xy)
    return Features(
        uv=uv,
        uv_und=uv,  # caller applies undistortion (camera-dependent)
        response=jnp.concatenate(all_score),
        angle=jnp.concatenate(all_angle),
        octave=jnp.concatenate(all_oct),
        desc=jnp.concatenate(all_desc),
        valid=jnp.concatenate(all_valid),
    )


def make_extractor(height: int, width: int, n_features: int = 1000,
                   n_levels: int = 8, scale: float = 1.2,
                   ini_th: float = 20.0, min_th: float = 7.0):
    """Build a jitted extractor for a fixed image geometry."""
    specs = tuple(make_level_specs(height, width, n_features, n_levels, scale))

    @jax.jit
    def run(img: jnp.ndarray) -> Features:
        return extract_orb(img, specs, ini_th, min_th)

    return run, specs
