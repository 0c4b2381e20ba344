"""KF-chain partitioned bundle adjustment with halo exchange.

`dist_ba.py` shards landmarks and REPLICATES all poses (one psum of the
full reduced camera system).  That is the right trade for small maps,
but the reduced system is O((6C)^2): past a few hundred keyframes the
replicated solve and its psum dominate.  This module adds the scale-out
the SURVEY §2.3 "CP-analog" row prescribes: partition the keyframe
TEMPORAL CHAIN into contiguous blocks, one per device — the structure
that bounds the reference's own problem growth (sliding-window inertial
BA over the chain, src/Optimizer.cc:9190-9307; covisibility decays with
chain distance) — and solve with overlapping block relaxation:

* each device owns a contiguous KF block + `halo` boundary keyframes on
  each side (copies of its neighbours' edge KFs, frozen during the local
  step — exactly a context-parallel halo);
* landmarks are assigned to the device of their anchor keyframe;
  observations from outside the block+halo are dropped (covisibility
  locality makes these rare for chain-local maps);
* each outer iteration: local GN step (Schur over local landmarks,
  dense solve on the small local block) then `ppermute` halo refresh of
  the boundary poses — communication is O(halo * 6) per step, no global
  psum, poses are sharded;
* convergence: overlapping additive-Schwarz/block-Gauss-Seidel — a few
  outer sweeps reach the global GN fixed point for chain-structured
  problems.

Tested on the virtual 8-device CPU mesh against the single-device
engine (tests/test_chain_ba.py).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..solver import residuals as RES
from ..solver.residuals import PinholeK

CHI2_MONO = 5.991


class ChainBAData(NamedTuple):
    """Host-partitioned problem.  D = number of shards, W = KFs per
    shard, Wh = W + 2*halo (local window incl. halos), Pl = landmarks
    per shard, Ol = observations per shard.  Leading axis is the shard
    axis (sharded over the mesh)."""
    kf_pose: jnp.ndarray     # [D, Wh, 3, 4] local window poses (w/ halos)
    kf_free: jnp.ndarray     # [D, Wh] halo + gauge KFs are False
    pt_xyz: jnp.ndarray      # [D, Pl, 3]
    pt_free: jnp.ndarray     # [D, Pl]
    obs_kf: jnp.ndarray      # [D, Ol] LOCAL window index (0..Wh-1)
    obs_pt: jnp.ndarray      # [D, Ol] LOCAL landmark index
    obs_uv: jnp.ndarray      # [D, Ol, 2]
    obs_valid: jnp.ndarray   # [D, Ol]
    obs_is2: jnp.ndarray     # [D, Ol]


def partition_chain(n_shards: int, halo: int, chain: np.ndarray,
                    kf_pose: np.ndarray, obs_kf: np.ndarray,
                    obs_pt: np.ndarray, obs_uv: np.ndarray,
                    obs_is2: np.ndarray, pt_xyz: np.ndarray,
                    fixed_kf: np.ndarray = None):
    """Host-side partitioner: contiguous chain blocks + halos.

    chain: [C] keyframe ids in temporal order.  obs_kf refers to chain
    POSITIONS (0..C-1).  Landmarks are anchored at the chain position of
    their first observation.  Returns (ChainBAData, layout) where layout
    lets the caller scatter results back ((shard, local_idx) per chain
    position and per landmark)."""
    C = len(chain)
    W = -(-C // n_shards)
    Wh = W + 2 * halo
    D = n_shards

    # anchor shard per landmark = shard of the MIDDLE of its observing
    # span (keeps both ends of the span inside window+halo)
    n_pts = len(pt_xyz)
    first_pos = np.full(n_pts, C - 1, np.int64)
    np.minimum.at(first_pos, obs_pt, obs_kf)
    last_pos = np.zeros(n_pts, np.int64)
    np.maximum.at(last_pos, obs_pt, obs_kf)
    mid_pos = (first_pos + last_pos) // 2
    shard_of_pt = np.clip(mid_pos // W, 0, D - 1)

    # local landmark indexing
    Pl = max(int(np.bincount(shard_of_pt, minlength=D).max()), 1)
    local_of_pt = np.zeros(n_pts, np.int64)
    for d in range(D):
        sel = np.nonzero(shard_of_pt == d)[0]
        local_of_pt[sel] = np.arange(len(sel))

    # observations routed to their landmark's shard, kept only if the
    # observing KF is inside that shard's window (+halo)
    shard_of_obs = shard_of_pt[obs_pt]
    lo = shard_of_obs * W - halo
    local_kf = obs_kf - lo
    keep = (local_kf >= 0) & (local_kf < Wh)
    n_drop = int((~keep).sum())

    counts = np.bincount(shard_of_obs[keep], minlength=D)
    Ol = max(int(counts.max()), 1)

    data_obs_kf = np.zeros((D, Ol), np.int32)
    data_obs_pt = np.zeros((D, Ol), np.int32)
    data_obs_uv = np.zeros((D, Ol, 2), np.float32)
    data_obs_is2 = np.ones((D, Ol), np.float32)
    data_obs_valid = np.zeros((D, Ol), bool)
    for d in range(D):
        sel = np.nonzero(keep & (shard_of_obs == d))[0]
        k = len(sel)
        data_obs_kf[d, :k] = local_kf[sel]
        data_obs_pt[d, :k] = local_of_pt[obs_pt[sel]]
        data_obs_uv[d, :k] = obs_uv[sel]
        data_obs_is2[d, :k] = obs_is2[sel]
        data_obs_valid[d, :k] = True

    # local pose windows (+halos); out-of-range slots hold identity
    data_pose = np.tile(np.eye(3, 4, dtype=np.float32), (D, Wh, 1, 1))
    data_free = np.zeros((D, Wh), bool)
    for d in range(D):
        for j in range(Wh):
            pos = d * W - halo + j
            if 0 <= pos < C:
                data_pose[d, j] = kf_pose[pos]
                own = (halo <= j < halo + W) and (d * W + (j - halo) < C)
                data_free[d, j] = own
                if fixed_kf is not None and pos in fixed_kf:
                    data_free[d, j] = False

    data_pt = np.zeros((D, Pl, 3), np.float32)
    data_ptfree = np.zeros((D, Pl), bool)
    for d in range(D):
        sel = np.nonzero(shard_of_pt == d)[0]
        data_pt[d, :len(sel)] = pt_xyz[sel]
        data_ptfree[d, :len(sel)] = True

    layout = {"W": W, "Wh": Wh, "halo": halo, "C": C,
              "shard_of_pt": shard_of_pt, "local_of_pt": local_of_pt,
              "n_dropped_obs": n_drop}
    return ChainBAData(
        kf_pose=jnp.asarray(data_pose), kf_free=jnp.asarray(data_free),
        pt_xyz=jnp.asarray(data_pt), pt_free=jnp.asarray(data_ptfree),
        obs_kf=jnp.asarray(data_obs_kf), obs_pt=jnp.asarray(data_obs_pt),
        obs_uv=jnp.asarray(data_obs_uv),
        obs_valid=jnp.asarray(data_obs_valid),
        obs_is2=jnp.asarray(data_obs_is2)), layout


def gather_results(layout, poses_out: np.ndarray, pts_out: np.ndarray,
                   n_pts: int):
    """Scatter sharded results back to chain order / landmark ids."""
    W, Wh, halo, C = (layout["W"], layout["Wh"], layout["halo"],
                      layout["C"])
    D = poses_out.shape[0]
    chain_poses = np.zeros((C, 3, 4), np.float32)
    for d in range(D):
        for j in range(halo, halo + W):
            pos = d * W + (j - halo)
            if pos < C:
                chain_poses[pos] = poses_out[d, j]
    pts = np.zeros((n_pts, 3), np.float32)
    sp, lp = layout["shard_of_pt"], layout["local_of_pt"]
    pts[np.arange(n_pts)] = pts_out[sp, lp]
    return chain_poses, pts


def make_chain_ba(K: PinholeK, mesh: Mesh, axis: str, Wh: int, Pl: int,
                  Ol: int, outer_iters: int = 6, halo: int = 2,
                  lam: float = 1e-3):
    """Jitted chain-partitioned BA step.  run(data) -> (kf_pose, pt_xyz)
    with the same sharded layout as the input."""
    res_fn = RES.make_point_reproj(K)
    S = Wh * 6

    def local_gn(pose_w, free_w, pts_l, pt_free_l, obs_kf, obs_pt, obs_uv,
                 obs_valid, obs_is2):
        """One damped GN step on the local window (poses [Wh,3,4])."""
        def one(delta, P34, X, uv):
            dp, dX = delta[:6], delta[6:]
            return res_fn((P34, X), (dp, dX), {"uv": uv})

        P34 = pose_w[obs_kf]
        X = pts_l[obs_pt]
        z = jnp.zeros((obs_kf.shape[0], 9), jnp.float32)
        r = jax.vmap(one)(z, P34, X, obs_uv)
        J = jax.vmap(jax.jacfwd(one))(z, P34, X, obs_uv)
        s = jnp.sqrt(obs_is2)[:, None]
        r = r * s
        J = J * s[..., None]
        chi2 = jnp.sum(r * r, -1)
        huber = jnp.minimum(1.0, jnp.sqrt(CHI2_MONO)
                            / jnp.sqrt(jnp.maximum(chi2, 1e-18)))
        w = huber * obs_valid.astype(jnp.float32)
        Jc, Jp = J[:, :, :6], J[:, :, 6:]
        Jcw = Jc * w[:, None, None]

        rows = obs_kf[:, None] * 6 + jnp.arange(6)[None, :]
        Hcc = jnp.zeros((S, S), jnp.float32)
        Hcc = Hcc.at[rows[:, :, None], rows[:, None, :]].add(
            jnp.einsum("kdi,kdj->kij", Jcw, Jc))
        gc = jnp.zeros((S,), jnp.float32)
        gc = gc.at[rows].add(-jnp.einsum("kdi,kd->ki", Jcw, r))

        Hpp = jnp.zeros((Pl, 3, 3), jnp.float32)
        Hpp = Hpp.at[obs_pt].add(
            jnp.einsum("kdi,kdj->kij", Jp * w[:, None, None], Jp))
        gp = jnp.zeros((Pl, 3), jnp.float32)
        gp = gp.at[obs_pt].add(
            -jnp.einsum("kdi,kd->ki", Jp * w[:, None, None], r))
        B = jnp.zeros((S, Pl * 3), jnp.float32)
        ccols = obs_pt[:, None] * 3 + jnp.arange(3)[None, :]
        B = B.at[rows[:, :, None], ccols[:, None, :]].add(
            jnp.einsum("kdi,kdj->kij", Jcw, Jp))

        # same scale-aware floor + GRAM-form fill-in as engine.solve_step
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
        rhs = gc - jnp.einsum(
            "spj,pj->s", G, jnp.einsum("pij,pi->pj", Ffac, gp))

        free6 = jnp.repeat(free_w.astype(jnp.float32), 6)
        diag = jnp.diagonal(H_red)
        H_red = H_red + jnp.diag(diag * lam + 1e-6)
        H_red = H_red * free6[:, None] * free6[None, :] \
            + jnp.diag(1.0 - free6)
        rhs = rhs * free6
        dx = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H_red, lower=True), rhs) * free6

        rhs_p = gp - jnp.einsum("spi,s->pi", B3, dx)
        dxp = jnp.einsum("pij,pj->pi", Dinv, rhs_p) * pt_free_l[:, None]

        dx6 = dx.reshape(Wh, 6)
        Rn, tn = jax.vmap(RES.retract_pose_cw_single)(pose_w, dx6)
        pose_new = jnp.concatenate([Rn, tn[..., None]], -1)
        return pose_new, pts_l + dxp

    def shard_body(pose_w, free_w, pts_l, pt_free_l, obs_kf, obs_pt,
                   obs_uv, obs_valid, obs_is2):
        # shard_map passes blocks with a leading axis of 1
        pose_w = pose_w[0]
        free_w = free_w[0]
        pts_l = pts_l[0]
        pt_free_l = pt_free_l[0]
        obs_kf, obs_pt = obs_kf[0], obs_pt[0]
        obs_uv, obs_valid, obs_is2 = obs_uv[0], obs_valid[0], obs_is2[0]

        n_dev = jax.lax.psum(1, axis)
        W = Wh - 2 * halo

        def refresh_halos(pose_w):
            """CP-style halo exchange via ppermute: my left halo = left
            neighbour's last owned KFs; right halo = right neighbour's
            first owned KFs."""
            right_edge = jax.lax.dynamic_slice_in_dim(
                pose_w, halo + W - halo, halo, 0)   # my last owned
            left_edge = jax.lax.dynamic_slice_in_dim(
                pose_w, halo, halo, 0)              # my first owned
            from_left = jax.lax.ppermute(
                right_edge, axis,
                [(d, (d + 1) % n_dev) for d in range(n_dev)])
            from_right = jax.lax.ppermute(
                left_edge, axis,
                [(d, (d - 1) % n_dev) for d in range(n_dev)])
            idx = jax.lax.axis_index(axis)
            # wrap-around halos at the chain ends keep their frozen init
            pose_w = jnp.where(
                (idx > 0),
                jax.lax.dynamic_update_slice_in_dim(pose_w, from_left, 0, 0),
                pose_w)
            pose_w = jnp.where(
                (idx < n_dev - 1),
                jax.lax.dynamic_update_slice_in_dim(
                    pose_w, from_right, halo + W, 0),
                pose_w)
            return pose_w

        def outer(carry, _):
            pose_w, pts_l = carry
            pose_w, pts_l = local_gn(pose_w, free_w, pts_l, pt_free_l,
                                     obs_kf, obs_pt, obs_uv, obs_valid,
                                     obs_is2)
            pose_w = refresh_halos(pose_w)
            return (pose_w, pts_l), None

        (pose_w, pts_l), _ = jax.lax.scan(
            outer, (pose_w, pts_l), None, length=outer_iters)
        return pose_w[None], pts_l[None]

    spec = P(axis)
    sharded = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(spec,) * 9, out_specs=(spec, spec), check_vma=False)

    @jax.jit
    def run(data: ChainBAData):
        return sharded(data.kf_pose, data.kf_free, data.pt_xyz,
                       data.pt_free, data.obs_kf, data.obs_pt,
                       data.obs_uv, data.obs_valid, data.obs_is2)

    return run
