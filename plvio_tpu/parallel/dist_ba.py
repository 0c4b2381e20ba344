"""Distributed bundle adjustment over a device mesh.

The reference has no distributed computing (SURVEY §2.3) — this is the
TPU-native scale-out of its biggest compute: BA.  Partition scheme (the
"TP" row of SURVEY §2.3):

* landmarks (points) are sharded across the mesh axis, and every
  observation lives on the shard of its landmark (host buckets them);
* camera/pose state is replicated;
* each device linearizes its observation shard, Schur-eliminates its own
  landmark blocks, and produces a *local* reduced camera system;
* one `psum` over the mesh assembles the global reduced system
  S_red = H_cc - sum_d B_d D_d^-1 B_d^T  (and rhs) — this is the only
  communication, O(S^2) per iteration, riding ICI;
* the dense solve is computed redundantly on every device (cheaper than
  sharding a small Cholesky), then each device back-substitutes its own
  landmark updates locally.

Runs under `jax.shard_map` on any 1-D mesh; tests exercise it on the
8-device virtual CPU mesh against the single-device engine.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..solver import residuals as RES
from ..solver.residuals import PinholeK

CHI2_MONO = 5.991


class DistBAData(NamedTuple):
    """Host-bucketed problem data.  Leading dims: P_total = shards *
    pts_per_shard, O_total = shards * obs_per_shard; slices are laid out
    so shard d owns [d*per_shard : (d+1)*per_shard]."""
    kf_poses: jnp.ndarray    # [C,3,4] replicated
    kf_free: jnp.ndarray     # [C]
    pt_xyz: jnp.ndarray      # [P_total,3] sharded
    pt_free: jnp.ndarray     # [P_total]
    obs_kf: jnp.ndarray      # [O_total] camera index (global)
    obs_pt: jnp.ndarray      # [O_total] landmark index LOCAL to its shard
    obs_uv: jnp.ndarray      # [O_total,2]
    obs_valid: jnp.ndarray   # [O_total]
    obs_is2: jnp.ndarray     # [O_total]


def bucket_observations(n_shards: int, n_pts: int, obs_pt: np.ndarray,
                        obs_arrays: Tuple[np.ndarray, ...],
                        pts_arrays: Tuple[np.ndarray, ...]):
    """Host-side: partition landmarks round-robin-contiguously into
    n_shards, relabel observations with shard-local landmark indices, pad
    each shard's observation list to a common size.

    Returns (pts_per_shard, obs_per_shard, obs_pt_local [O_total],
    shard_of_obs ordering arrays applied to obs_arrays, padded pts_arrays).
    """
    pts_per_shard = -(-n_pts // n_shards)
    P_total = pts_per_shard * n_shards
    shard_of_pt = np.arange(P_total) // pts_per_shard
    local_of_pt = np.arange(P_total) % pts_per_shard

    shard_of_obs = shard_of_pt[obs_pt]
    counts = np.bincount(shard_of_obs, minlength=n_shards)
    obs_per_shard = int(counts.max()) if len(obs_pt) else 1
    O_total = obs_per_shard * n_shards

    order = np.argsort(shard_of_obs, kind="stable")
    out_obs = []
    for arr in obs_arrays:
        pad_shape = (O_total,) + arr.shape[1:]
        out = np.zeros(pad_shape, arr.dtype)
        pos = 0
        src = arr[order]
        so = shard_of_obs[order]
        for d in range(n_shards):
            seg = src[so == d]
            out[d * obs_per_shard: d * obs_per_shard + len(seg)] = seg
            pos += len(seg)
        out_obs.append(out)
    # validity mask for padding slots
    valid = np.zeros(O_total, bool)
    for d in range(n_shards):
        valid[d * obs_per_shard: d * obs_per_shard + counts[d]] = True
    # local landmark index per obs
    pt_sorted = obs_pt[order]
    lp = local_of_pt[pt_sorted]
    obs_pt_local = np.zeros(O_total, np.int32)
    for d in range(n_shards):
        seg = lp[shard_of_obs[order] == d]
        obs_pt_local[d * obs_per_shard: d * obs_per_shard + len(seg)] = seg

    out_pts = []
    for arr in pts_arrays:
        pad_shape = (P_total,) + arr.shape[1:]
        out = np.zeros(pad_shape, arr.dtype)
        out[:len(arr)] = arr
        out_pts.append(out)
    return pts_per_shard, obs_per_shard, obs_pt_local, valid, out_obs, out_pts


def make_dist_ba(K: PinholeK, mesh: Mesh, axis: str, n_cams: int,
                 iters: int = 10, lam: float = 1e-3):
    """Build the jitted distributed-BA step for fixed capacities.

    Returns run(data: DistBAData) -> (kf_poses, pt_xyz).
    """
    res_fn = RES.make_point_reproj(K)
    S = n_cams * 6

    def linearize(poses, pts, obs_kf, obs_pt, obs_uv, w):
        """Per-shard linearization: r [O,2], Jc [O,2,6], Jp [O,2,3]."""
        def one(delta, P34, X, uv):
            dp, dX = delta[:6], delta[6:]
            return res_fn((P34, X), (dp, dX), {"uv": uv})

        P34 = poses[obs_kf]
        X = pts[obs_pt]
        z = jnp.zeros((obs_kf.shape[0], 9), jnp.float32)
        r = jax.vmap(one)(z, P34, X, obs_uv)
        J = jax.vmap(jax.jacfwd(one))(z, P34, X, obs_uv)
        # whiten + robust weight
        s = jnp.sqrt(w)[:, None]
        r = r * s
        J = J * s[..., None]
        chi2 = jnp.sum(r * r, -1)
        huber = jnp.minimum(1.0, jnp.sqrt(CHI2_MONO) /
                            jnp.sqrt(jnp.maximum(chi2, 1e-18)))
        return r, J[:, :, :6], J[:, :, 6:], huber

    def local_reduce(poses, pts_local, pt_free_l, obs_kf, obs_pt_l, obs_uv,
                     obs_valid, obs_is2):
        r, Jc, Jp, huber = linearize(poses, pts_local, obs_kf, obs_pt_l,
                                     obs_uv, obs_is2)
        w = huber * obs_valid.astype(jnp.float32)
        Jcw = Jc * w[:, None, None]
        # camera-side
        Pl = pts_local.shape[0]
        Hcc = jnp.zeros((S, S), jnp.float32)
        gc = jnp.zeros((S,), jnp.float32)
        rows = obs_kf[:, None] * 6 + jnp.arange(6)[None, :]
        Hcc_blocks = jnp.einsum("kdi,kdj->kij", Jcw, Jc)
        Hcc = Hcc.at[rows[:, :, None], rows[:, None, :]].add(Hcc_blocks)
        gc = gc.at[rows].add(-jnp.einsum("kdi,kd->ki", Jcw, r))
        # landmark-side
        Hpp = jnp.zeros((Pl, 3, 3), jnp.float32)
        gp = jnp.zeros((Pl, 3), jnp.float32)
        Hpp = Hpp.at[obs_pt_l].add(jnp.einsum("kdi,kdj->kij", Jp * w[:, None, None], Jp))
        gp = gp.at[obs_pt_l].add(-jnp.einsum("kdi,kd->ki", Jp * w[:, None, None], r))
        B = jnp.zeros((S, Pl * 3), jnp.float32)
        ccols = (obs_pt_l[:, None] * 3 + jnp.arange(3)[None, :])
        Hcp = jnp.einsum("kdi,kdj->kij", Jcw, Jp)
        B = B.at[rows[:, :, None], ccols[:, None, :]].add(Hcp)

        # damp + factor landmark blocks (same scale-aware floor +
        # GRAM-form fill-in as engine.solve_step: the direct
        # B*Dinv*B^T einsum loses enough in f32 to push the reduced
        # system's small eigenvalues negative)
        dpp = jnp.einsum("pii->pi", Hpp)
        occupied = (dpp.sum(-1) > 1e-9) & pt_free_l
        eye3 = jnp.eye(3, dtype=jnp.float32)
        floor = 1e-4 * jnp.mean(dpp, axis=-1, keepdims=True)
        Hpp_d = Hpp + jax.vmap(jnp.diag)(dpp * lam + floor + 1e-6)
        Hpp_d = jnp.where(occupied[:, None, None], Hpp_d, eye3[None])
        from ..solver.engine import chol_invT_blocks
        Ffac = chol_invT_blocks(Hpp_d)
        blk_ok = jnp.all(jnp.isfinite(Ffac), axis=(-2, -1)) \
            & (jnp.max(jnp.abs(Ffac), axis=(-2, -1)) < 1e3)
        occupied = occupied & blk_ok
        Ffac = jnp.where(occupied[:, None, None], Ffac, 0.0)
        Dinv = jnp.einsum("pij,pkj->pik", Ffac, Ffac)
        B3 = B.reshape(S, Pl, 3)
        G = jnp.einsum("spi,pij->spj", B3, Ffac)
        Gm = G.reshape(S, Pl * 3)
        H_red = Hcc - jax.lax.dot(Gm, Gm.T,
                                  precision=jax.lax.Precision.HIGH)
        rhs_red = gc - jnp.einsum(
            "spj,pj->s", G, jnp.einsum("pij,pi->pj", Ffac, gp))
        return H_red, rhs_red, Dinv, B3, gp

    def shard_step(poses, free6, pts_l, pt_free_l, obs_kf, obs_pt_l, obs_uv,
                   obs_valid, obs_is2):
        H_l, rhs_l, Dinv, B3, gp = local_reduce(
            poses, pts_l, pt_free_l, obs_kf, obs_pt_l, obs_uv, obs_valid,
            obs_is2)
        # THE collective: assemble the global reduced camera system
        H = jax.lax.psum(H_l, axis)
        rhs = jax.lax.psum(rhs_l, axis)
        # damping + gauge freeze (replicated)
        diag = jnp.diagonal(H)
        H = H + jnp.diag(diag * lam + 1e-6)
        H = H * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
        rhs = rhs * free6
        dx = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H, lower=True), rhs) * free6
        # local landmark back-substitution
        rhs_p = gp - jnp.einsum("spi,s->pi", B3, dx)
        dxp = jnp.einsum("pij,pj->pi", Dinv, rhs_p) * pt_free_l[:, None]
        return dx, dxp

    in_specs = (P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                P(axis), P(axis))
    sharded = jax.shard_map(shard_step, mesh=mesh, in_specs=in_specs,
                            out_specs=(P(), P(axis)), check_vma=False)

    @jax.jit
    def run(data: DistBAData):
        free6 = jnp.repeat(data.kf_free.astype(jnp.float32), 6)

        def body(carry, _):
            poses, pts = carry
            dx, dxp = sharded(poses, free6, pts, data.pt_free, data.obs_kf,
                              data.obs_pt, data.obs_uv, data.obs_valid,
                              data.obs_is2)
            poses = RES.retract_pose_cw(poses, dx.reshape(n_cams, 6))
            pts = pts + dxp
            return (poses, pts), None

        (poses, pts), _ = jax.lax.scan(
            body, (data.kf_poses, data.pt_xyz), None, length=iters)
        return poses, pts

    return run
