"""Stage-cost profiling in the REAL bench shape: lax.scan over a stack of
distinct frames, timed with different scalar inputs per rep so no layer of
the stack (or the dev-tunnel relay) can serve cached results."""
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

H, W, NFEAT, CAP, NF = 480, 752, 1000, 2048, 16
REPS = 8


def timeit(name, fn, make_args):
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(REPS):
        out = fn(*make_args(r + 1))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (REPS * NF)
    print(f"{name:44s} {dt*1e3:8.3f} ms/frame")
    return out


def main():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (NF, H, W)), jnp.float32)
    frames = jax.device_put(frames)
    specs = tuple(FE.make_level_specs(H, W, NFEAT))
    K = PinholeK(fx=458.654, fy=457.296, cx=367.215, cy=248.375)

    xyz = jax.device_put(
        jnp.asarray(rng.uniform(-2, 2, (CAP, 3)) + [0, 0, 4], jnp.float32))
    desc = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, (CAP, 8), dtype=np.uint32)))
    valid = jax.device_put(jnp.ones(CAP, bool))
    pose0 = jnp.asarray(np.eye(3, 4), jnp.float32)

    def scan_over(frame_fn):
        @jax.jit
        def run(frames, bias):
            def body(carry, img):
                out = frame_fn(img + bias, carry)
                return carry, out
            _, outs = jax.lax.scan(body, 0.0, frames)
            return jax.tree_util.tree_map(lambda x: x[-1], outs)
        return run

    # 1. extraction only
    f1 = scan_over(lambda img, c: FE.extract_orb(img, specs).uv.sum())
    timeit("scan: extract only", f1,
           lambda r: (frames, jnp.float32(r * 1e-3)))

    # 2. extraction + hamming + gate + match
    def ext_match(img, c):
        feats = FE.extract_orb(img, specs)
        dist = M.hamming_matrix(M.unpack_u32_to_pm1(desc), feats.desc)
        gate = M.window_gate(jnp.zeros((CAP, 2)) + 100.0, feats.uv, 20.0)
        idx, ok = M.match_nn_ratio(dist, valid, feats.valid, gate,
                                   max_dist=80.0, ratio=0.9)
        return idx.sum() + ok.sum()
    f2 = scan_over(ext_match)
    timeit("scan: extract+match", f2,
           lambda r: (frames, jnp.float32(r * 1e-3)))

    # 3. full tracking step (extract+match+pose opt)
    import __graft_entry__ as g
    fn, _ = g._tracking_step_fn(H, W, n_features=NFEAT, cap_pts=CAP)

    @jax.jit
    def f3(frames, p0):
        def body(pose, img):
            new_pose, n_inl = fn(img, pose, xyz, desc, valid)
            return new_pose, n_inl
        pose_fin, n_inls = jax.lax.scan(body, p0, frames)
        return pose_fin
    timeit("scan: FULL tracking step", f3,
           lambda r: (frames, pose0 + jnp.float32(r) * 1e-5))

    # 4. match only (no extraction), fixed desc sets per frame via scan
    fdesc = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, (NF, NFEAT, 8), dtype=np.uint32)))
    fuv = jax.device_put(
        jnp.asarray(rng.uniform(0, 400, (NF, NFEAT, 2)), jnp.float32))

    @jax.jit
    def f4(fdesc, fuv, bias):
        def body(c, xs):
            d, uv = xs
            dist = M.hamming_matrix(M.unpack_u32_to_pm1(desc),
                                    M.unpack_u32_to_pm1(d)) + bias
            gate = M.window_gate(jnp.zeros((CAP, 2)) + 100.0, uv, 20.0)
            idx, ok = M.match_nn_ratio(dist, valid,
                                       jnp.ones(NFEAT, bool), gate,
                                       max_dist=80.0, ratio=0.9)
            return c, idx.sum() + ok.sum()
        _, outs = jax.lax.scan(body, 0, (fdesc, fuv))
        return outs[-1]
    timeit("scan: match only", f4,
           lambda r: (fdesc, fuv, jnp.float32(r * 1e-4)))

    # 5. pose opt only
    uv_m = jax.device_put(jnp.asarray(
        rng.uniform(0, 400, (NF, CAP, 2)), jnp.float32))
    ok_m = jax.device_put(jnp.ones((NF, CAP), bool))
    is2 = jnp.ones(CAP, jnp.float32)

    @jax.jit
    def f5(uv_m, ok_m, p0):
        def body(pose, xs):
            uv, ok = xs
            new_pose, inl, n = fast_pose_opt(K, pose, uv, xyz, ok, is2,
                                             rounds=4, iters=3)
            return new_pose, n
        pose_fin, _ = jax.lax.scan(body, p0, (uv_m, ok_m))
        return pose_fin
    timeit("scan: pose opt only", f5,
           lambda r: (uv_m, ok_m, pose0 + jnp.float32(r) * 1e-5))


if __name__ == "__main__":
    main()
