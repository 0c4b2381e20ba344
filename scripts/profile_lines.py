"""Per-stage cost of the line front end in the REAL bench shape
(lax.scan over distinct frames, varying bias per rep so neither XLA nor
the axon relay can serve cached results — see scripts/profile_scan.py).

Stages mirror ops/lines.extract_lines_pyramid: detect (L0), detect (L1),
merge_collinear, refine_segments, LBD, dedupe+concat, and the full
pyramid for reference.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_lines.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from plvio_tpu.ops import lines as LN

H, W, NF, REPS = 480, 752, 8, 6
MAXL = 256


def timeit(name, frame_fn):
    @jax.jit
    def run(frames, bias):
        def body(carry, img):
            out = frame_fn(img + bias)
            s = jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(jnp.asarray(x, jnp.float32)), out,
                jnp.float32(0.0))
            return carry + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), frames)
        return acc

    rng = np.random.default_rng(0)
    # structured frames: random boxes so the detector has real segments
    base = np.zeros((NF, H, W), np.float32)
    for f in range(NF):
        for _ in range(30):
            x0, y0 = rng.integers(20, W - 120), rng.integers(20, H - 120)
            w_, h_ = rng.integers(30, 100, 2)
            base[f, y0:y0 + h_, x0:x0 + w_] += rng.uniform(30, 90)
    frames = jax.device_put(jnp.asarray(base + rng.uniform(0, 4, base.shape),
                                        jnp.float32))
    out = run(frames, jnp.float32(0.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(REPS):
        out = run(frames, jnp.float32(r + 1) * 1e-3)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (REPS * NF)
    print(f"{name:40s} {dt*1e3:8.3f} ms/frame", flush=True)
    return dt


def main():
    n1 = MAXL // 4
    n0 = MAXL - n1

    def det0(img):
        ep, ang, ln, v, (gx, gy) = LN.detect_lines(img, n0)
        return ep, ang, ln, v

    def det1(img):
        h2, w2 = (H // 2) * 2, (W // 2) * 2
        img1 = img[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
        ep, ang, ln, v, _ = LN.detect_lines(img1, n1)
        return ep, ang, ln, v

    def det_merge(img):
        ep, ang, ln, v, (gx, gy) = LN.detect_lines(img, n0)
        return LN.merge_collinear(ep, v)

    def det_merge_refine(img):
        ep, ang, ln, v, (gx, gy) = LN.detect_lines(img, n0)
        ep, ln, v = LN.merge_collinear(ep, v)
        return LN.refine_segments(gx, gy, ep, v)

    def det_full_l0(img):
        return LN.extract_lines(img, n0)

    def full(img):
        return LN.extract_lines_pyramid(img, MAXL)

    t_det0 = timeit("detect_lines L0", det0)
    t_det1 = timeit("detect_lines L1 (incl. downsample)", det1)
    t_dm = timeit("L0 + merge_collinear", det_merge)
    t_dmr = timeit("L0 + merge + refine_segments", det_merge_refine)
    t_l0 = timeit("L0 full (merge+refine+LBD+eq)", det_full_l0)
    t_full = timeit("extract_lines_pyramid (production)", full)
    print("---- deltas ----")
    print(f"merge_collinear            ~{(t_dm - t_det0)*1e3:7.3f} ms")
    print(f"refine_segments            ~{(t_dmr - t_dm)*1e3:7.3f} ms")
    print(f"LBD + line_eq              ~{(t_l0 - t_dmr)*1e3:7.3f} ms")
    print(f"L1 level total             ~{(t_full - t_l0)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
