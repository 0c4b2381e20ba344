"""Stage-level profiling of the per-frame tracking hot path on the real
chip.  Each stage is jitted separately and timed with a scan over N
iterations on-device to amortize dispatch overhead."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from plvio_tpu.ops import frontend as FE
from plvio_tpu.ops import matching as M
from plvio_tpu.models.kernels import fast_pose_opt
from plvio_tpu.solver.residuals import PinholeK

H, W, NFEAT, CAP = 480, 752, 1000, 2048
REPS = 32


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:36s} {dt*1e3:8.3f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    specs = tuple(FE.make_level_specs(H, W, NFEAT))

    pyr_fn = jax.jit(lambda im: FE.build_pyramid(im, list(specs)))
    pyr = timeit("pyramid", pyr_fn, img)

    lv0 = pyr[0]

    fast_fn = jax.jit(lambda im: FE.nms3x3(FE.fast_response(im, 20.0)))
    r = timeit("fast+nms (level0, 1 threshold)", fast_fn, lv0)

    topk_fn = jax.jit(lambda r: FE.select_grid_topk(r, specs[0].n_keep))
    xy, score, valid = timeit("grid topk (level0)", topk_fn, r)

    patch_fn = jax.jit(FE.extract_patches)
    patches = timeit("extract_patches (level0)", patch_fn, lv0, xy)

    ang_fn = jax.jit(FE.ic_angle_patch)
    ang = timeit("ic_angle_patch (level0)", ang_fn, patches)

    blur_fn = jax.jit(FE.blur_patches)
    blur = timeit("blur_patches (level0)", blur_fn, patches)

    desc_fn = jax.jit(FE.brief_descriptors_patch)
    desc = timeit("brief desc (level0)", desc_fn, blur, ang)

    ext_fn = jax.jit(lambda im: FE.extract_orb(im, specs))
    feats = timeit("FULL extract (8 levels)", ext_fn, img)

    # matching
    pt_desc = jnp.asarray(
        rng.integers(0, 2 ** 32, (CAP, 8), dtype=np.uint32))
    dist_fn = jax.jit(
        lambda pd, fd: M.hamming_matrix(M.unpack_u32_to_pm1(pd), fd))
    dist = timeit("hamming matrix 2048x1000", dist_fn, pt_desc, feats.desc)

    uvp = jnp.asarray(rng.uniform(0, 400, (CAP, 2)), jnp.float32)
    gate_fn = jax.jit(lambda a, b: M.window_gate(a, b, 20.0))
    gate = timeit("window gate", gate_fn, uvp, feats.uv)

    ok_map = jnp.ones(CAP, bool)
    match_fn = jax.jit(lambda d, g: M.match_nn_ratio(
        d, ok_map, feats.valid, g, max_dist=80.0, ratio=0.9))
    idx, ok = timeit("match_nn_ratio", match_fn, dist, gate)

    # pose opt
    K = PinholeK(fx=458.654, fy=457.296, cx=367.215, cy=248.375)
    pose = jnp.asarray(np.eye(3, 4), jnp.float32)
    xyz = jnp.asarray(rng.uniform(-2, 2, (CAP, 3)) + [0, 0, 4], jnp.float32)
    uv_m = feats.uv[idx]
    is2 = jnp.ones(CAP, jnp.float32)
    po_fn = jax.jit(lambda p, uv: fast_pose_opt(
        K, p, uv, xyz, ok, is2, rounds=4, iters=3))
    timeit("fast_pose_opt 4x3", po_fn, pose, uv_m)


if __name__ == "__main__":
    main()
