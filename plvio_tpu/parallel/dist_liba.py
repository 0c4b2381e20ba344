"""EXACT distributed visual-inertial BA: landmark-sharded, one psum.

The production back-end problem (reference LocalInertialBA
src/Optimizer.cc:9185 / FullInertialBA :1374 + the *WithLine variants):
per-KF 15-DoF states, inertial + bias-RW chain edges, Schur-eliminated
point and line landmarks.  Distribution strategy (the dist_ba pattern
generalized through the solver engine's `psum_axis`):

* the 15-DoF KF states are REPLICATED on every device;
* point and line landmarks are sharded round-robin; every observation
  lives on its landmark's owner device, so each device Schur-eliminates
  its own landmarks exactly;
* dense-only terms (inertial chain edges, bias random walks) are gated
  to device 0 by masking — psum restores their single contribution;
* ONE psum of the Schur-reduced (15C x 15C) camera system per GN
  iteration reconstructs the exact global normal equations: the step is
  IDENTICAL to the single-device solve (no Schwarz relaxation, no halo
  lag), so convergence is the engine's own LM convergence.

Communication = S^2 floats per iteration (S = 15*C), riding ICI.  For
C <= ~200 keyframes this is the right trade (SURVEY §2.3); beyond that
the chained block schedule (models/loop_closing._run_gba_chained) calls
this solver per block.

Production dispatch: models/local_mapping.LocalMapper routes its LIBA /
VIBA window solves here whenever >1 device is visible, and
models/loop_closing.run_global_ba does the same for inertial maps.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..solver import engine as E
from ..solver import residuals as RES

CHI2_MONO = 5.991


class DistLIBAData(NamedTuple):
    """Sharded problem.  D = mesh size; leading axis on sharded fields.
    Dense fields are replicated (no leading D axis)."""
    kf_pose_wb: jnp.ndarray    # [C,3,4] replicated
    kf_vel: jnp.ndarray        # [C,3]
    kf_bg: jnp.ndarray         # [C,3]
    kf_ba: jnp.ndarray         # [C,3]
    kf_free: jnp.ndarray       # [C]
    kf_free_bias: jnp.ndarray  # [C]
    pt_xyz: jnp.ndarray        # [D,Pl,3] sharded
    pt_free: jnp.ndarray       # [D,Pl]
    obs_kf: jnp.ndarray        # [D,Ol]
    obs_pt: jnp.ndarray        # [D,Ol] LOCAL landmark index
    obs_uv: jnp.ndarray        # [D,Ol,2]
    obs_valid: jnp.ndarray     # [D,Ol]
    obs_is2: jnp.ndarray       # [D,Ol]
    ln_ep: jnp.ndarray         # [D,Ll,6]
    ln_free: jnp.ndarray       # [D,Ll]
    lobs_kf: jnp.ndarray       # [D,Lo]
    lobs_ln: jnp.ndarray       # [D,Lo]
    lobs_eq: jnp.ndarray       # [D,Lo,3]
    lobs_valid: jnp.ndarray    # [D,Lo]
    pre_const: dict            # [C-1,...] replicated
    imu_info: jnp.ndarray      # [C-1,9,9]
    edge_valid: jnp.ndarray    # [C-1]
    rw_info_g: jnp.ndarray     # [C-1]
    rw_info_a: jnp.ndarray     # [C-1]


def shard_landmarks(D: int, n_lm: int, obs_lm: np.ndarray,
                    obs_cols: list, lm_cols: list,
                    Pl: int = None, Ol: int = None):
    """Round-robin landmark sharding.  obs_lm: landmark id per
    observation; obs_cols/lm_cols: [(array, fill, dtype), ...].
    Optional Pl/Ol force the padded table sizes (stable compiled
    shapes); per-shard overflow beyond Ol is dropped (the LBA paths
    already subsample observations under caps).
    Returns (obs tables [D,Ol,...] + local obs_lm + valid,
             lm tables [D,Pl,...] + local free, shard_of, local_of)."""
    shard_of = np.arange(n_lm) % D if n_lm else np.zeros(0, np.int64)
    local_of = np.arange(n_lm) // D if n_lm else np.zeros(0, np.int64)
    Pl = Pl or max(-(-n_lm // D), 1)
    s_obs = shard_of[obs_lm] if len(obs_lm) else np.zeros(0, np.int64)
    Ol = Ol or max(int(np.bincount(s_obs, minlength=D).max())
                   if len(s_obs) else 1, 1)
    obs_out = [np.full((D, Ol) + a.shape[1:], fill, dtype)
               for a, fill, dtype in obs_cols]
    obs_lm_out = np.zeros((D, Ol), np.int32)
    valid = np.zeros((D, Ol), bool)
    for d in range(D):
        sel = np.nonzero(s_obs == d)[0][:Ol]
        k = len(sel)
        for o, (a, _, _) in zip(obs_out, obs_cols):
            o[d, :k] = a[sel]
        obs_lm_out[d, :k] = local_of[obs_lm[sel]]
        valid[d, :k] = True
    lm_out = [np.full((D, Pl) + a.shape[1:], fill, dtype)
              for a, fill, dtype in lm_cols]
    lm_free = np.zeros((D, Pl), bool)
    for d in range(D):
        sel = np.nonzero(shard_of == d)[0]
        for o, (a, _, _) in zip(lm_out, lm_cols):
            o[d, :len(sel)] = a[sel]
        lm_free[d, :len(sel)] = True
    return obs_out, obs_lm_out, valid, lm_out, lm_free, shard_of, local_of


def build_dist_liba(D: int, pose_wb, vel, bg, ba, kf_free, kf_free_bias,
                    obs_kf, obs_pt, obs_uv, obs_is2, pt_xyz,
                    pre_stack, imu_info, edge_valid, rw_g, rw_a,
                    lobs_kf=None, lobs_ln=None, lobs_eq=None,
                    ln_ep=None):
    """Host-side builder.  Indices are chain positions (0..C-1).
    Returns (DistLIBAData, layout)."""
    (obs_tabs, obs_pt_l, ovalid, lm_tabs, pt_free_l, sp, lp) = \
        shard_landmarks(
            D, len(pt_xyz), obs_pt,
            [(obs_kf.astype(np.int32), 0, np.int32),
             (obs_uv.astype(np.float32), 0, np.float32),
             (obs_is2.astype(np.float32), 1, np.float32)],
            [(pt_xyz.astype(np.float32), 0, np.float32)])
    okf_t, ouv_t, ois_t = obs_tabs
    (pt_t,) = lm_tabs

    have_lines = ln_ep is not None and len(ln_ep) > 0 \
        and lobs_kf is not None and len(lobs_kf) > 0
    if have_lines:
        (ltabs, lln_l, lvalid, lntabs, ln_free_l, spl, lpl) = \
            shard_landmarks(
                D, len(ln_ep), lobs_ln,
                [(lobs_kf.astype(np.int32), 0, np.int32),
                 (lobs_eq.astype(np.float32), 0, np.float32)],
                [(ln_ep.astype(np.float32), 0, np.float32)])
        lkf_t, leq_t = ltabs
        (ln_t,) = lntabs
    else:
        lkf_t = np.zeros((D, 1), np.int32)
        leq_t = np.zeros((D, 1, 3), np.float32)
        lln_l = np.zeros((D, 1), np.int32)
        lvalid = np.zeros((D, 1), bool)
        ln_t = np.zeros((D, 1, 6), np.float32)
        ln_free_l = np.zeros((D, 1), bool)
        spl = lpl = None

    layout = {"D": D, "shard_of_pt": sp, "local_of_pt": lp,
              "shard_of_ln": spl, "local_of_ln": lpl,
              "have_lines": have_lines}
    data = DistLIBAData(
        kf_pose_wb=jnp.asarray(pose_wb, jnp.float32),
        kf_vel=jnp.asarray(vel, jnp.float32),
        kf_bg=jnp.asarray(bg, jnp.float32),
        kf_ba=jnp.asarray(ba, jnp.float32),
        kf_free=jnp.asarray(kf_free),
        kf_free_bias=jnp.asarray(kf_free_bias),
        pt_xyz=jnp.asarray(pt_t), pt_free=jnp.asarray(pt_free_l),
        obs_kf=jnp.asarray(okf_t), obs_pt=jnp.asarray(obs_pt_l),
        obs_uv=jnp.asarray(ouv_t), obs_valid=jnp.asarray(ovalid),
        obs_is2=jnp.asarray(ois_t),
        ln_ep=jnp.asarray(ln_t), ln_free=jnp.asarray(ln_free_l),
        lobs_kf=jnp.asarray(lkf_t), lobs_ln=jnp.asarray(lln_l),
        lobs_eq=jnp.asarray(leq_t), lobs_valid=jnp.asarray(lvalid),
        pre_const={k: jnp.asarray(np.asarray(v), jnp.float32)
                   for k, v in pre_stack.items()},
        imu_info=jnp.asarray(imu_info, jnp.float32),
        edge_valid=jnp.asarray(edge_valid),
        rw_info_g=jnp.asarray(rw_g, jnp.float32),
        rw_info_a=jnp.asarray(rw_a, jnp.float32))
    return data, layout


def gather_landmarks(layout, pts_out, lns_out=None, n_pts=0, n_lns=0):
    pts = np.zeros((n_pts, 3), np.float32)
    if n_pts:
        pts = np.asarray(pts_out)[layout["shard_of_pt"],
                                  layout["local_of_pt"]]
    lns = None
    if n_lns and layout["have_lines"]:
        lns = np.asarray(lns_out)[layout["shard_of_ln"],
                                  layout["local_of_ln"]]
    return pts, lns


def make_dist_liba(K, mesh: Mesh, axis: str, C: int, Pl: int, Ol: int,
                   Ll: int, Lo: int, Rcb, tcb, gravity: float,
                   rounds: int = 2, iters: int = 8,
                   early_tol: float = 1e-2):
    """Jitted exact distributed VI-BA.  run(data) ->
    (pose, vel, bg, ba [replicated], pt [D,Pl,3], ln [D,Ll,6])."""
    Rcb = jnp.asarray(Rcb, jnp.float32)
    tcb = jnp.asarray(tcb, jnp.float32)
    reproj_fn = RES.point_reproj_body_ba_for(K, Rcb, tcb)
    line_fn = RES.make_line_reproj_body_ba(K, Rcb, tcb)
    inertial_fn = RES.make_inertial(gravity)
    idx1 = jnp.arange(C - 1, dtype=jnp.int32)
    idx2 = idx1 + 1

    def shard_body(pose, vel, bg, ba, kf_free, kf_free_bias,
                   pt, pt_free, obs_kf, obs_pt, obs_uv, obs_valid,
                   obs_is2, ln, ln_free, lobs_kf, lobs_ln, lobs_eq,
                   lobs_valid, pre, imu_info, edge_valid, rw_g, rw_a):
        # sharded fields arrive with a leading axis of 1
        pt, pt_free = pt[0], pt_free[0]
        obs_kf, obs_pt = obs_kf[0], obs_pt[0]
        obs_uv, obs_valid, obs_is2 = obs_uv[0], obs_valid[0], obs_is2[0]
        ln, ln_free = ln[0], ln_free[0]
        lobs_kf, lobs_ln = lobs_kf[0], lobs_ln[0]
        lobs_eq, lobs_valid = lobs_eq[0], lobs_valid[0]

        # dense-only chain terms contribute from device 0 only — the
        # psum of the reduced system restores their single copy
        dev0 = jax.lax.axis_index(axis) == 0
        ev = edge_valid & dev0

        states = {"pose": pose, "vel": vel, "bg": bg, "ba": ba,
                  "pt": pt, "ln": ln}
        free = {"pose": kf_free, "vel": kf_free,
                "bg": kf_free_bias, "ba": kf_free_bias}
        mask, mask_l = obs_valid, lobs_valid
        for _ in range(rounds):
            prob = E.Problem(linear_solver="cg", psum_axis=axis)
            prob.add_dense("pose", C, 6, RES.retract_pose_wb)
            prob.add_dense("vel", C, 3, RES.retract_additive)
            prob.add_dense("bg", C, 3, RES.retract_additive)
            prob.add_dense("ba", C, 3, RES.retract_additive)
            prob.add_landmarks("pt", Pl, 3, RES.retract_additive)
            prob.add_landmarks("ln", Ll, 6, RES.retract_additive)
            prob.add_term(E.Term(
                name="reproj", res_fn=reproj_fn, rdim=2,
                dense_refs=[("pose", obs_kf)], lm_ref=("pt", obs_pt),
                const={"uv": obs_uv}, mask=mask, info=obs_is2,
                robust_delta=float(np.sqrt(CHI2_MONO))))
            prob.add_term(E.Term(
                name="line", res_fn=line_fn, rdim=2,
                dense_refs=[("pose", lobs_kf)], lm_ref=("ln", lobs_ln),
                const={"l": lobs_eq}, mask=mask_l,
                info=jnp.ones(Lo, jnp.float32),
                robust_delta=float(np.sqrt(CHI2_MONO))))
            prob.add_term(E.Term(
                name="inertial", res_fn=inertial_fn, rdim=9,
                dense_refs=[("pose", idx1), ("vel", idx1), ("bg", idx1),
                            ("ba", idx1), ("pose", idx2), ("vel", idx2)],
                const=pre, mask=ev, info=imu_info))
            prob.add_term(E.Term(
                name="bg_rw", res_fn=RES.bias_rw, rdim=3,
                dense_refs=[("bg", idx1), ("bg", idx2)],
                const=None, mask=ev, info=rw_g))
            prob.add_term(E.Term(
                name="ba_rw", res_fn=RES.bias_rw, rdim=3,
                dense_refs=[("ba", idx1), ("ba", idx2)],
                const=None, mask=ev, info=rw_a))
            states, _, chi2s = E.optimize(
                prob, states, iters=iters, early_tol=early_tol,
                dense_free_mask=free,
                lm_free_mask={"pt": pt_free, "ln": ln_free})
            mask = obs_valid & (chi2s["reproj"] < CHI2_MONO)
            mask_l = lobs_valid & (chi2s["line"] < CHI2_MONO)
        return (states["pose"], states["vel"], states["bg"],
                states["ba"], states["pt"][None], states["ln"][None])

    rep = P()
    sh = P(axis)

    def run(data: DistLIBAData):
        in_specs = ((rep,) * 6 + (sh,) * 13
                    + (jax.tree_util.tree_map(lambda _: rep,
                                              data.pre_const),)
                    + (rep,) * 4)
        sharded = jax.shard_map(
            shard_body, mesh=mesh, in_specs=in_specs,
            out_specs=(rep, rep, rep, rep, sh, sh), check_vma=False)
        return jax.jit(sharded)(
            data.kf_pose_wb, data.kf_vel, data.kf_bg, data.kf_ba,
            data.kf_free, data.kf_free_bias, data.pt_xyz, data.pt_free,
            data.obs_kf, data.obs_pt, data.obs_uv, data.obs_valid,
            data.obs_is2, data.ln_ep, data.ln_free, data.lobs_kf,
            data.lobs_ln, data.lobs_eq, data.lobs_valid,
            data.pre_const, data.imu_info, data.edge_valid,
            data.rw_info_g, data.rw_info_a)

    return run


def _bucket(n: int, base: int = 64) -> int:
    """Round up to a stable compile bucket (power-of-two-ish)."""
    b = base
    while b < n:
        b *= 2
    return b


class DistLIBARunner:
    """Production adapter: LocalMapper routes its LIBA / VIBA / FIBA
    window solves here when >1 device is visible.  Pads every problem
    to stable shape buckets so the sharded program compiles once per
    bucket, and caches the compiled run per (C, Pl, Ol, Ll, Lo)."""

    def __init__(self, K, Rcb, tcb, gravity: float, mesh: Mesh = None,
                 axis: str = "lm"):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), (axis,))
        self.K = K
        self.mesh = mesh
        self.axis = axis
        self.D = int(np.prod(mesh.devices.shape))
        self.Rcb = np.asarray(Rcb, np.float32)
        self.tcb = np.asarray(tcb, np.float32)
        self.gravity = float(gravity)
        self._cache = {}

    def solve(self, pose_wb, vel, bg, ba, kf_free, kf_free_bias,
              obs_kf, obs_pt, obs_uv, obs_is2, pt_xyz,
              pre_stack, imu_info, edge_valid, rw_g, rw_a,
              lobs_kf=None, lobs_ln=None, lobs_eq=None, ln_ep=None,
              rounds: int = 2, iters: int = 8):
        """All inputs UNPADDED; chain indices 0..C-1.  Returns
        (pose_wb, vel, bg, ba [C..], pt_xyz [n_pts,3], ln_ep or None)."""
        n = len(pose_wb)
        C = _bucket(n, 8)
        n_pts = len(pt_xyz)

        def padc(a, fill=0.0):
            out = np.full((C,) + np.asarray(a).shape[1:], fill,
                          np.asarray(a).dtype)
            out[:n] = a
            return out

        pose_p = np.tile(np.eye(3, 4, dtype=np.float32), (C, 1, 1))
        pose_p[:n] = pose_wb
        vel_p, bg_p, ba_p = padc(vel), padc(bg), padc(ba)
        free_p = np.zeros(C, bool); free_p[:n] = kf_free
        freeb_p = np.zeros(C, bool); freeb_p[:n] = kf_free_bias

        pre_p = {k: np.zeros((C - 1,) + np.asarray(v).shape[1:],
                             np.float32) for k, v in pre_stack.items()}
        for k, v in pre_stack.items():
            pre_p[k][:n - 1] = np.asarray(v)[:n - 1]
        info_p = np.tile(np.eye(9, dtype=np.float32), (C - 1, 1, 1))
        info_p[:n - 1] = imu_info[:n - 1]
        ev_p = np.zeros(C - 1, bool); ev_p[:n - 1] = edge_valid[:n - 1]
        rwg_p = np.zeros(C - 1, np.float32); rwg_p[:n - 1] = rw_g[:n - 1]
        rwa_p = np.zeros(C - 1, np.float32); rwa_p[:n - 1] = rw_a[:n - 1]

        Pl = _bucket(-(-max(n_pts, 1) // self.D), 32)
        Ol = _bucket(-(-max(len(obs_kf), 1) // self.D) * 2, 64)
        have_lines = ln_ep is not None and len(ln_ep) > 0 \
            and lobs_kf is not None and len(lobs_kf) > 0
        if have_lines:
            Ll = _bucket(-(-len(ln_ep) // self.D), 8)
            Lo = _bucket(-(-len(lobs_kf) // self.D) * 2, 16)
        else:
            Ll = Lo = 1

        (obs_tabs, obs_pt_l, ovalid, lm_tabs, pt_free_l, sp, lp) = \
            shard_landmarks(
                self.D, n_pts, obs_pt,
                [(obs_kf.astype(np.int32), 0, np.int32),
                 (obs_uv.astype(np.float32), 0, np.float32),
                 (obs_is2.astype(np.float32), 1, np.float32)],
                [(pt_xyz.astype(np.float32), 0, np.float32)],
                Pl=Pl, Ol=Ol)
        okf_t, ouv_t, ois_t = obs_tabs
        (pt_t,) = lm_tabs
        if have_lines:
            (ltabs, lln_l, lvalid, lntabs, ln_free_l, spl, lpl) = \
                shard_landmarks(
                    self.D, len(ln_ep), lobs_ln,
                    [(lobs_kf.astype(np.int32), 0, np.int32),
                     (lobs_eq.astype(np.float32), 0, np.float32)],
                    [(ln_ep.astype(np.float32), 0, np.float32)],
                    Pl=Ll, Ol=Lo)
            lkf_t, leq_t = ltabs
            (ln_t,) = lntabs
        else:
            lkf_t = np.zeros((self.D, 1), np.int32)
            leq_t = np.zeros((self.D, 1, 3), np.float32)
            lln_l = np.zeros((self.D, 1), np.int32)
            lvalid = np.zeros((self.D, 1), bool)
            ln_t = np.zeros((self.D, 1, 6), np.float32)
            ln_free_l = np.zeros((self.D, 1), bool)
            spl = lpl = None

        data = DistLIBAData(
            kf_pose_wb=jnp.asarray(pose_p), kf_vel=jnp.asarray(vel_p),
            kf_bg=jnp.asarray(bg_p), kf_ba=jnp.asarray(ba_p),
            kf_free=jnp.asarray(free_p),
            kf_free_bias=jnp.asarray(freeb_p),
            pt_xyz=jnp.asarray(pt_t), pt_free=jnp.asarray(pt_free_l),
            obs_kf=jnp.asarray(okf_t), obs_pt=jnp.asarray(obs_pt_l),
            obs_uv=jnp.asarray(ouv_t), obs_valid=jnp.asarray(ovalid),
            obs_is2=jnp.asarray(ois_t),
            ln_ep=jnp.asarray(ln_t), ln_free=jnp.asarray(ln_free_l),
            lobs_kf=jnp.asarray(lkf_t), lobs_ln=jnp.asarray(lln_l),
            lobs_eq=jnp.asarray(leq_t), lobs_valid=jnp.asarray(lvalid),
            pre_const={k: jnp.asarray(v) for k, v in pre_p.items()},
            imu_info=jnp.asarray(info_p), edge_valid=jnp.asarray(ev_p),
            rw_info_g=jnp.asarray(rwg_p), rw_info_a=jnp.asarray(rwa_p))

        key = (C, Pl, Ol, Ll, Lo, rounds, iters)
        run = self._cache.get(key)
        if run is None:
            run = make_dist_liba(
                self.K, self.mesh, self.axis, C, Pl, Ol, Ll, Lo,
                self.Rcb, self.tcb, self.gravity,
                rounds=rounds, iters=iters)
            self._cache[key] = run
        pose_o, vel_o, bg_o, ba_o, pt_o, ln_o = run(data)
        layout = {"shard_of_pt": sp, "local_of_pt": lp,
                  "shard_of_ln": spl, "local_of_ln": lpl,
                  "have_lines": have_lines}
        pts, lns = gather_landmarks(
            layout, np.asarray(pt_o), np.asarray(ln_o),
            n_pts=n_pts, n_lns=len(ln_ep) if have_lines else 0)
        return (np.asarray(pose_o)[:n], np.asarray(vel_o)[:n],
                np.asarray(bg_o)[:n], np.asarray(ba_o)[:n], pts, lns)
