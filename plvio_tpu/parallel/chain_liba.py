"""Chain-partitioned visual-INERTIAL bundle adjustment with lines.

`chain_ba.py` scales the points-only visual problem over the device
mesh; the PRODUCTION back-end problem is richer (reference
LocalInertialBA src/Optimizer.cc:9185 / FullInertialBA :1374 and their
*WithLine variants): per-KF 15-DoF states (body pose, velocity, gyro +
acc bias), inertial preintegration edges + bias random-walk edges along
the temporal chain, Schur-eliminated point landmarks AND line-endpoint
landmarks.  This module shards THAT problem:

* the KF temporal chain is cut into contiguous blocks, one per device,
  with `halo` frozen boundary keyframes on each side (their full
  15-DoF state is exchanged — an inertial edge spanning a block cut is
  solved by both neighbours, each holding the other side frozen:
  overlapping additive Schwarz);
* point and line landmarks are anchored at the middle chain position
  of their observation span; observations from keyframes outside the
  anchor's window+halo are dropped (covisibility locality);
* each outer sweep runs the SAME term structure as the single-device
  window kernel (models/kernels.make_local_inertial_ba) on the local
  block via the masked GN/LM engine, then `ppermute`s the halo states
  — communication is O(halo * 15) floats per sweep, no global
  collective, so it rides ICI on real hardware.

Production dispatch: LoopCloser.run_global_ba and the LocalMapper VIBA
pulses route through this module whenever the runtime exposes >1
device (models/loop_closing.py / local_mapping.py); the single-device
fallback runs the identical partition shard-sequentially.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..solver import engine as E
from ..solver import residuals as RES
from ..solver.residuals import PinholeK

CHI2_MONO = 5.991


class ChainLIBAData(NamedTuple):
    """Host-partitioned VI problem.  D shards x Wh-KF local windows
    (W owned + 2*halo boundary copies).  Leading axis = shard axis."""
    kf_pose: jnp.ndarray     # [D, Wh, 3, 4] body poses T_wb
    kf_vel: jnp.ndarray      # [D, Wh, 3]
    kf_bg: jnp.ndarray       # [D, Wh, 3]
    kf_ba: jnp.ndarray       # [D, Wh, 3]
    kf_free: jnp.ndarray     # [D, Wh] pose+vel free (halos/gauge False)
    kf_free_bias: jnp.ndarray  # [D, Wh]
    pt_xyz: jnp.ndarray      # [D, Pl, 3]
    pt_free: jnp.ndarray     # [D, Pl]
    obs_kf: jnp.ndarray      # [D, Ol] local window slot
    obs_pt: jnp.ndarray      # [D, Ol] local landmark slot
    obs_uv: jnp.ndarray      # [D, Ol, 2]
    obs_valid: jnp.ndarray   # [D, Ol]
    obs_is2: jnp.ndarray     # [D, Ol]
    ln_ep: jnp.ndarray       # [D, Ll, 6]
    ln_free: jnp.ndarray     # [D, Ll]
    lobs_kf: jnp.ndarray     # [D, Lo]
    lobs_ln: jnp.ndarray     # [D, Lo]
    lobs_eq: jnp.ndarray     # [D, Lo, 3]
    lobs_valid: jnp.ndarray  # [D, Lo]
    pre_const: dict          # each [D, Wh-1, ...] stacked preint consts
    imu_info: jnp.ndarray    # [D, Wh-1, 9, 9]
    edge_valid: jnp.ndarray  # [D, Wh-1]
    rw_info_g: jnp.ndarray   # [D, Wh-1]
    rw_info_a: jnp.ndarray   # [D, Wh-1]


def _route_landmarks(D, W, Wh, halo, n_lm, obs_kf_pos, obs_pt):
    """Anchor each landmark at the middle chain position of its span;
    return (shard_of_lm, local_of_lm, per-shard obs keep mask)."""
    C_hint = obs_kf_pos.max() + 1 if len(obs_kf_pos) else 1
    first = np.full(n_lm, C_hint, np.int64)
    np.minimum.at(first, obs_pt, obs_kf_pos)
    last = np.zeros(n_lm, np.int64)
    np.maximum.at(last, obs_pt, obs_kf_pos)
    mid = (first + last) // 2
    shard_of = np.clip(mid // W, 0, D - 1)
    local_of = np.zeros(n_lm, np.int64)
    for d in range(D):
        sel = np.nonzero(shard_of == d)[0]
        local_of[sel] = np.arange(len(sel))
    shard_of_obs = shard_of[obs_pt]
    lo = shard_of_obs * W - halo
    local_kf = obs_kf_pos - lo
    keep = (local_kf >= 0) & (local_kf < Wh)
    return shard_of, local_of, shard_of_obs, local_kf, keep


def _pack_obs(D, cap, sel_shard, keep, cols):
    """Scatter kept observations into [D, cap, ...] padded tables.
    cols: list of (array, fill, dtype) parallel to observations."""
    outs = [np.full((D, cap) + a.shape[1:], fill, dtype)
            for a, fill, dtype in cols]
    valid = np.zeros((D, cap), bool)
    for d in range(D):
        sel = np.nonzero(keep & (sel_shard == d))[0][:cap]
        k = len(sel)
        for o, (a, _, _) in zip(outs, cols):
            o[d, :k] = a[sel]
        valid[d, :k] = True
    return outs, valid


def partition_chain_vi(n_shards: int, halo: int, chain_pos_count: int,
                       pose_wb: np.ndarray, vel: np.ndarray,
                       bg: np.ndarray, ba: np.ndarray,
                       obs_kf: np.ndarray, obs_pt: np.ndarray,
                       obs_uv: np.ndarray, obs_is2: np.ndarray,
                       pt_xyz: np.ndarray,
                       pre_stack: dict, imu_info: np.ndarray,
                       edge_valid: np.ndarray, rw_g: np.ndarray,
                       rw_a: np.ndarray,
                       lobs_kf: np.ndarray = None,
                       lobs_ln: np.ndarray = None,
                       lobs_eq: np.ndarray = None,
                       ln_ep: np.ndarray = None,
                       fixed_pos=(0,), free_all_biases: bool = True):
    """Host-side partitioner.  All `*_kf` indices are CHAIN POSITIONS
    (0..C-1); `pre_stack`/`imu_info`/`edge_valid`/`rw_*` describe the
    C-1 chain edges (edge i connects positions i and i+1).  Returns
    (ChainLIBAData, layout)."""
    C = chain_pos_count
    D = n_shards
    W = -(-C // D)
    Wh = W + 2 * halo

    n_pts = len(pt_xyz)
    sp, lp, s_obs, lkf, keep = _route_landmarks(
        D, W, Wh, halo, n_pts, obs_kf, obs_pt)
    Pl = max(int(np.bincount(sp, minlength=D).max()), 1)
    Ol = max(int(np.bincount(s_obs[keep], minlength=D).max()), 1)
    (okf_t, opt_t, ouv_t, ois_t), ovalid = _pack_obs(
        D, Ol, s_obs, keep,
        [(lkf.astype(np.int32), 0, np.int32),
         (lp[obs_pt].astype(np.int32), 0, np.int32),
         (obs_uv.astype(np.float32), 0, np.float32),
         (obs_is2.astype(np.float32), 1, np.float32)])

    data_pt = np.zeros((D, Pl, 3), np.float32)
    data_ptfree = np.zeros((D, Pl), bool)
    for d in range(D):
        sel = np.nonzero(sp == d)[0]
        data_pt[d, :len(sel)] = pt_xyz[sel]
        data_ptfree[d, :len(sel)] = True

    # lines (optional)
    have_lines = ln_ep is not None and len(ln_ep) > 0 \
        and lobs_kf is not None and len(lobs_kf) > 0
    if have_lines:
        n_lns = len(ln_ep)
        spl, lpl, s_lobs, llkf, lkeep = _route_landmarks(
            D, W, Wh, halo, n_lns, lobs_kf, lobs_ln)
        Ll = max(int(np.bincount(spl, minlength=D).max()), 1)
        Lo = max(int(np.bincount(s_lobs[lkeep], minlength=D).max()), 1)
        (lkf_t, lln_t, leq_t), lvalid = _pack_obs(
            D, Lo, s_lobs, lkeep,
            [(llkf.astype(np.int32), 0, np.int32),
             (lpl[lobs_ln].astype(np.int32), 0, np.int32),
             (lobs_eq.astype(np.float32), 0, np.float32)])
        data_ln = np.zeros((D, Ll, 6), np.float32)
        data_lnfree = np.zeros((D, Ll), bool)
        for d in range(D):
            sel = np.nonzero(spl == d)[0]
            data_ln[d, :len(sel)] = ln_ep[sel]
            data_lnfree[d, :len(sel)] = True
    else:
        Ll, Lo = 1, 1
        spl = lpl = None
        data_ln = np.zeros((D, 1, 6), np.float32)
        data_lnfree = np.zeros((D, 1), bool)
        lkf_t = np.zeros((D, 1), np.int32)
        lln_t = np.zeros((D, 1), np.int32)
        leq_t = np.zeros((D, 1, 3), np.float32)
        lvalid = np.zeros((D, 1), bool)

    # per-shard 15-DoF windows
    data_pose = np.tile(np.eye(3, 4, dtype=np.float32), (D, Wh, 1, 1))
    data_vel = np.zeros((D, Wh, 3), np.float32)
    data_bg = np.zeros((D, Wh, 3), np.float32)
    data_ba = np.zeros((D, Wh, 3), np.float32)
    data_free = np.zeros((D, Wh), bool)
    data_free_b = np.zeros((D, Wh), bool)
    fixed_pos = set(int(f) for f in np.atleast_1d(fixed_pos))
    for d in range(D):
        for j in range(Wh):
            pos = d * W - halo + j
            if 0 <= pos < C:
                data_pose[d, j] = pose_wb[pos]
                data_vel[d, j] = vel[pos]
                data_bg[d, j] = bg[pos]
                data_ba[d, j] = ba[pos]
                own = (halo <= j < halo + W) and (d * W + (j - halo) < C)
                fr = own and pos not in fixed_pos
                data_free[d, j] = fr
                data_free_b[d, j] = (own if free_all_biases else fr)

    # chain-edge tables: edge slot j of shard d = chain edge at
    # pos0 = d*W - halo + j (valid if both ends inside the window AND
    # the global edge is valid)
    ident = {k: np.zeros_like(np.asarray(v[0]))
             for k, v in pre_stack.items()} if len(edge_valid) else {}
    data_pre = {k: np.zeros((D, Wh - 1) + np.asarray(v).shape[1:],
                            np.float32) for k, v in pre_stack.items()}
    data_info = np.tile(np.eye(9, dtype=np.float32), (D, Wh - 1, 1, 1))
    data_ev = np.zeros((D, Wh - 1), bool)
    data_rwg = np.zeros((D, Wh - 1), np.float32)
    data_rwa = np.zeros((D, Wh - 1), np.float32)
    # f32 conditioning bound: the block solves mix visual information
    # (~1 px^-2) with preintegration information that can reach 1e8+
    # for short, quiet edges — past ~1e6 the visual terms fall below
    # f32 round-off inside the reduced system and the Schwarz sweeps
    # random-walk instead of converging.  Scaling an edge's whole info
    # block preserves its internal correlations.
    INFO_MAX = 1e6
    for d in range(D):
        for j in range(Wh - 1):
            pos = d * W - halo + j
            if 0 <= pos < C - 1 and bool(edge_valid[pos]):
                for k in data_pre:
                    data_pre[k][d, j] = np.asarray(pre_stack[k][pos])
                info = np.asarray(imu_info[pos])
                s = max(1.0, float(np.abs(np.diag(info)).max()) / INFO_MAX)
                data_info[d, j] = info / s
                data_ev[d, j] = True
                data_rwg[d, j] = min(float(rw_g[pos]), INFO_MAX)
                data_rwa[d, j] = min(float(rw_a[pos]), INFO_MAX)

    layout = {"W": W, "Wh": Wh, "halo": halo, "C": C, "D": D,
              "shard_of_pt": sp, "local_of_pt": lp,
              "shard_of_ln": spl, "local_of_ln": lpl,
              "have_lines": have_lines}
    data = ChainLIBAData(
        kf_pose=jnp.asarray(data_pose), kf_vel=jnp.asarray(data_vel),
        kf_bg=jnp.asarray(data_bg), kf_ba=jnp.asarray(data_ba),
        kf_free=jnp.asarray(data_free),
        kf_free_bias=jnp.asarray(data_free_b),
        pt_xyz=jnp.asarray(data_pt), pt_free=jnp.asarray(data_ptfree),
        obs_kf=jnp.asarray(okf_t), obs_pt=jnp.asarray(opt_t),
        obs_uv=jnp.asarray(ouv_t), obs_valid=jnp.asarray(ovalid),
        obs_is2=jnp.asarray(ois_t),
        ln_ep=jnp.asarray(data_ln), ln_free=jnp.asarray(data_lnfree),
        lobs_kf=jnp.asarray(lkf_t), lobs_ln=jnp.asarray(lln_t),
        lobs_eq=jnp.asarray(leq_t), lobs_valid=jnp.asarray(lvalid),
        pre_const={k: jnp.asarray(v) for k, v in data_pre.items()},
        imu_info=jnp.asarray(data_info), edge_valid=jnp.asarray(data_ev),
        rw_info_g=jnp.asarray(data_rwg), rw_info_a=jnp.asarray(data_rwa))
    return data, layout


def gather_results_vi(layout, pose_out, vel_out, bg_out, ba_out,
                      pts_out, lns_out=None, n_pts: int = 0,
                      n_lns: int = 0):
    """Scatter sharded results back to chain order / landmark ids."""
    W, Wh, halo, C, D = (layout["W"], layout["Wh"], layout["halo"],
                         layout["C"], layout["D"])
    pose = np.zeros((C, 3, 4), np.float32)
    vel = np.zeros((C, 3), np.float32)
    bg = np.zeros((C, 3), np.float32)
    ba = np.zeros((C, 3), np.float32)
    for d in range(D):
        for j in range(halo, halo + W):
            pos = d * W + (j - halo)
            if pos < C:
                pose[pos] = pose_out[d, j]
                vel[pos] = vel_out[d, j]
                bg[pos] = bg_out[d, j]
                ba[pos] = ba_out[d, j]
    pts = np.zeros((n_pts, 3), np.float32)
    if n_pts:
        pts = np.asarray(pts_out)[layout["shard_of_pt"],
                                  layout["local_of_pt"]]
    lns = None
    if n_lns and layout["have_lines"]:
        lns = np.asarray(lns_out)[layout["shard_of_ln"],
                                  layout["local_of_ln"]]
    return pose, vel, bg, ba, pts, lns


def make_chain_liba(K: PinholeK, mesh: Mesh, axis: str, Wh: int,
                    Pl: int, Ol: int, Ll: int, Lo: int,
                    Rcb, tcb, gravity: float, halo: int = 2,
                    outer_sweeps: int = 3, iters: int = 6,
                    early_tol: float = 1e-2):
    """Sharded VI-BA step: run(data) -> (pose, vel, bg, ba, pts, lns)
    in the same sharded layout.  Each sweep = one local engine solve
    (same terms as models/kernels.make_local_inertial_ba) + halo
    ppermute of the full 15-DoF boundary states."""
    Rcb = jnp.asarray(Rcb, jnp.float32)
    tcb = jnp.asarray(tcb, jnp.float32)
    reproj_fn = RES.point_reproj_body_ba_for(K, Rcb, tcb)
    line_fn = RES.make_line_reproj_body_ba(K, Rcb, tcb)
    inertial_fn = RES.make_inertial(gravity)
    idx1 = jnp.arange(Wh - 1, dtype=jnp.int32)
    idx2 = idx1 + 1

    def local_solve(sd, mask, mask_l):
        """One engine solve on the local window; sd = dict of local
        (unsharded) arrays."""
        states = {"pose": sd["pose"], "vel": sd["vel"],
                  "bg": sd["bg"], "ba": sd["ba"],
                  "pt": sd["pt"], "ln": sd["ln"]}
        free = {"pose": sd["free"], "vel": sd["free"],
                "bg": sd["free_b"], "ba": sd["free_b"]}
        prob = E.Problem(linear_solver="cg")
        prob.add_dense("pose", Wh, 6, RES.retract_pose_wb)
        prob.add_dense("vel", Wh, 3, RES.retract_additive)
        prob.add_dense("bg", Wh, 3, RES.retract_additive)
        prob.add_dense("ba", Wh, 3, RES.retract_additive)
        prob.add_landmarks("pt", Pl, 3, RES.retract_additive)
        prob.add_landmarks("ln", Ll, 6, RES.retract_additive)
        prob.add_term(E.Term(
            name="reproj", res_fn=reproj_fn, rdim=2,
            dense_refs=[("pose", sd["obs_kf"])],
            lm_ref=("pt", sd["obs_pt"]),
            const={"uv": sd["obs_uv"]}, mask=mask, info=sd["obs_is2"],
            robust_delta=float(np.sqrt(CHI2_MONO))))
        prob.add_term(E.Term(
            name="line", res_fn=line_fn, rdim=2,
            dense_refs=[("pose", sd["lobs_kf"])],
            lm_ref=("ln", sd["lobs_ln"]),
            const={"l": sd["lobs_eq"]}, mask=mask_l,
            info=jnp.ones(Lo, jnp.float32),
            robust_delta=float(np.sqrt(CHI2_MONO))))
        prob.add_term(E.Term(
            name="inertial", res_fn=inertial_fn, rdim=9,
            dense_refs=[("pose", idx1), ("vel", idx1), ("bg", idx1),
                        ("ba", idx1), ("pose", idx2), ("vel", idx2)],
            const=sd["pre"], mask=sd["ev"], info=sd["imu_info"]))
        prob.add_term(E.Term(
            name="bg_rw", res_fn=RES.bias_rw, rdim=3,
            dense_refs=[("bg", idx1), ("bg", idx2)],
            const=None, mask=sd["ev"], info=sd["rw_g"]))
        prob.add_term(E.Term(
            name="ba_rw", res_fn=RES.bias_rw, rdim=3,
            dense_refs=[("ba", idx1), ("ba", idx2)],
            const=None, mask=sd["ev"], info=sd["rw_a"]))
        states, _, chi2s = E.optimize(
            prob, states, iters=iters, early_tol=early_tol,
            dense_free_mask=free,
            lm_free_mask={"pt": sd["pt_free"], "ln": sd["ln_free"]})
        mask = sd["obs_valid"] & (chi2s["reproj"] < CHI2_MONO)
        mask_l = sd["lobs_valid"] & (chi2s["line"] < CHI2_MONO)
        return states, mask, mask_l

    W = Wh - 2 * halo

    def shard_body(*flat):
        (pose, vel, bg, ba, free, free_b, pt, pt_free, obs_kf, obs_pt,
         obs_uv, obs_valid, obs_is2, ln, ln_free, lobs_kf, lobs_ln,
         lobs_eq, lobs_valid, pre, imu_info, ev, rw_g, rw_a) = flat
        # strip the leading shard axis of 1
        sd = {"pose": pose[0], "vel": vel[0], "bg": bg[0], "ba": ba[0],
              "free": free[0], "free_b": free_b[0],
              "pt": pt[0], "pt_free": pt_free[0],
              "obs_kf": obs_kf[0], "obs_pt": obs_pt[0],
              "obs_uv": obs_uv[0], "obs_valid": obs_valid[0],
              "obs_is2": obs_is2[0],
              "ln": ln[0], "ln_free": ln_free[0],
              "lobs_kf": lobs_kf[0], "lobs_ln": lobs_ln[0],
              "lobs_eq": lobs_eq[0], "lobs_valid": lobs_valid[0],
              "pre": jax.tree_util.tree_map(lambda x: x[0], pre),
              "imu_info": imu_info[0], "ev": ev[0],
              "rw_g": rw_g[0], "rw_a": rw_a[0]}
        n_dev = jax.lax.psum(1, axis)

        def refresh(x):
            """Halo exchange for one [Wh, ...] state array."""
            right_edge = jax.lax.dynamic_slice_in_dim(x, W, halo, 0)
            left_edge = jax.lax.dynamic_slice_in_dim(x, halo, halo, 0)
            from_left = jax.lax.ppermute(
                right_edge, axis,
                [(d, (d + 1) % n_dev) for d in range(n_dev)])
            from_right = jax.lax.ppermute(
                left_edge, axis,
                [(d, (d - 1) % n_dev) for d in range(n_dev)])
            i = jax.lax.axis_index(axis)
            x = jnp.where(i > 0,
                          jax.lax.dynamic_update_slice_in_dim(
                              x, from_left, 0, 0), x)
            x = jnp.where(i < n_dev - 1,
                          jax.lax.dynamic_update_slice_in_dim(
                              x, from_right, halo + W, 0), x)
            return x

        mask, mask_l = sd["obs_valid"], sd["lobs_valid"]
        # red-black block Gauss-Seidel: even shards update while odd
        # shards hold, then vice versa, halos refreshed between the two
        # phases.  Plain Jacobi (all shards at once) oscillates here:
        # noise-free preintegration edges carry near-rigid information,
        # so simultaneously-updated neighbours chase each other's stale
        # boundary states instead of converging (measured: tail error
        # WORSENED 0.075 -> 0.093 m from sweep 4 to 8 on the 24-KF
        # recovery test; red-black converges monotonically).
        i = jax.lax.axis_index(axis)
        for _ in range(outer_sweeps):
            for parity in (0, 1):
                states, m_new, ml_new = local_solve(sd, mask, mask_l)
                act = (i % 2) == parity
                for k, v in (("pose", states["pose"]),
                             ("vel", states["vel"]), ("bg", states["bg"]),
                             ("ba", states["ba"]), ("pt", states["pt"]),
                             ("ln", states["ln"])):
                    sd[k] = jnp.where(act, v, sd[k])
                mask = jnp.where(act, m_new, mask)
                mask_l = jnp.where(act, ml_new, mask_l)
                sd["pose"] = refresh(sd["pose"])
                sd["vel"] = refresh(sd["vel"])
                sd["bg"] = refresh(sd["bg"])
                sd["ba"] = refresh(sd["ba"])
        return (sd["pose"][None], sd["vel"][None], sd["bg"][None],
                sd["ba"][None], sd["pt"][None], sd["ln"][None])

    spec = P(axis)

    def _specs_for(data: ChainLIBAData):
        flat = (spec,) * 19 + (
            jax.tree_util.tree_map(lambda _: spec, data.pre_const),
            spec, spec, spec, spec)
        return flat

    def run(data: ChainLIBAData):
        sharded = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=_specs_for(data),
            out_specs=(spec,) * 6, check_vma=False)
        return jax.jit(sharded)(
            data.kf_pose, data.kf_vel, data.kf_bg, data.kf_ba,
            data.kf_free, data.kf_free_bias, data.pt_xyz, data.pt_free,
            data.obs_kf, data.obs_pt, data.obs_uv, data.obs_valid,
            data.obs_is2, data.ln_ep, data.ln_free, data.lobs_kf,
            data.lobs_ln, data.lobs_eq, data.lobs_valid,
            data.pre_const, data.imu_info, data.edge_valid,
            data.rw_info_g, data.rw_info_a)

    return run
