"""The masked Gauss-Newton / Levenberg-Marquardt engine.

This single module replaces the reference's ~40 bespoke g2o optimizer entry
points (reference: include/Optimizer.h:57-162, src/Optimizer.cc — 14.7k
LoC of hand-written vertices/edges/solvers).  Design (SURVEY §7.0):

* All *non-landmark* state (keyframe poses, velocities, biases, Sim3s,
  gravity direction, scale, ...) concatenates into ONE dense state vector
  with a static block layout.  Its Hessian is assembled densely — at SLAM
  sizes (tens of keyframes x 6..15 DoF) a dense MXU Cholesky beats any
  sparse structure the reference's CPU solver needed.
* Landmarks (3-DoF points, 6-DoF line endpoints) are Schur-eliminated:
  block-diagonal H_pp inverted batched (closed-form 3x3 / two 3x3 for
  lines), coupling B kept dense [S, P*dof] so the reduced camera system
  S_red = H_cc - B D^-1 B^T is two big matmuls (reference: g2o
  BlockSolver::schur, Thirdparty/g2o/g2o/core/block_solver.h).
* Every residual ("edge") is a pure function  res_fn(block_states,
  deltas, const) -> r  that applies its own retraction internally;
  linearization is vmapped jacfwd at delta=0 — exact Jacobians with no
  hand-derived 500-line `linearizeOplus` (reference: src/G2oTypes.cc,
  src/OptimizableTypes.cpp).
* Robustness: Huber IRLS weights in-graph; outlier rejection is chi2
  masking between fixed-trip-count rounds, replacing g2o edge levels
  (reference pattern: src/Optimizer.cc:2963-3075 — 4 rounds x 10 iters).

Everything below is shape-static and jit-safe.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Dense state layout
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class BlockDef:
    """A family of dense state blocks (e.g. 'kf_pose' x N keyframes)."""
    name: str
    count: int
    dof: int


class DenseLayout:
    """Static offsets of each block family in the dense state vector."""

    def __init__(self, blocks: Sequence[BlockDef]):
        self.blocks = {b.name: b for b in blocks}
        self.offsets: Dict[str, int] = {}
        off = 0
        for b in blocks:
            self.offsets[b.name] = off
            off += b.count * b.dof
        self.total = off

    def offset_of(self, name: str, idx: jnp.ndarray) -> jnp.ndarray:
        """Start offset(s) of block instance(s) `idx` of family `name`."""
        b = self.blocks[name]
        return self.offsets[name] + idx * b.dof

    def slice_delta(self, delta: jnp.ndarray, name: str) -> jnp.ndarray:
        """Extract [count, dof] deltas of one family from the dense delta."""
        b = self.blocks[name]
        off = self.offsets[name]
        return delta[off:off + b.count * b.dof].reshape(b.count, b.dof)


# --------------------------------------------------------------------------
# Terms (residual batches)
# --------------------------------------------------------------------------

@dataclass
class Term:
    """A batch of K identical residuals ("edges").

    res_fn(blocks, deltas, const) -> r [rdim]
      blocks: tuple of per-obs state slices (one per ref, in order
              dense refs then landmark ref)
      deltas: tuple of [dof] tangent vectors (same order); the residual
              applies its own retraction
      const:  per-obs constant pytree (measurements, calib, ...)
    """
    name: str
    res_fn: Callable
    rdim: int
    # dense block references: list of (family_name, idx_array [K])
    dense_refs: List[Tuple[str, jnp.ndarray]]
    # optional landmark reference (family handled by Schur): (name, idx [K])
    lm_ref: Optional[Tuple[str, jnp.ndarray]] = None
    const: Any = None
    mask: Optional[jnp.ndarray] = None          # [K] bool
    info: Optional[jnp.ndarray] = None          # [K] | [K,rdim] | [K,rdim,rdim]
    robust_delta: float = 0.0                   # 0 = no robustifier
    chi2_th: float = 0.0                        # 0 = no gating info returned


@dataclass(frozen=True)
class LandmarkFamily:
    name: str
    count: int
    dof: int    # 3 for points, 6 for line endpoints


# --------------------------------------------------------------------------
# Linearization
# --------------------------------------------------------------------------

def _whiten(r, J, info):
    """Apply sqrt-information to residual [K,d] and Jacobian [K,d,n]."""
    if info is None:
        return r, J
    if info.ndim == 1:          # scalar per obs
        s = jnp.sqrt(info)[:, None]
        return r * s, J * s[..., None]
    if info.ndim == 2:          # diagonal per obs
        s = jnp.sqrt(info)
        return r * s, J * s[..., None]
    # full matrix: use cholesky L^T so that |L^T r|^2 = r^T Info r
    L = jnp.linalg.cholesky(info)                 # [K,d,d]
    Lt = jnp.swapaxes(L, -1, -2)
    return jnp.einsum("kij,kj->ki", Lt, r), jnp.einsum("kij,kjn->kin", Lt, J)


def _inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of batched 3x3 SPD blocks: pure VPU
    arithmetic.  jnp.linalg.inv lowers to batched LU on TPU, which
    scalarizes and dominates the Schur elimination at landmark counts
    (measured ~half the windowed-BA iteration cost)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b * i
    co02 = b * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b * g - a * h
    co22 = a * e - b * d
    det = a * co00 + b * co10 + c * co20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    out = jnp.stack([jnp.stack([co00, co01, co02], -1),
                     jnp.stack([co10, co11, co12], -1),
                     jnp.stack([co20, co21, co22], -1)], -2)
    return out * inv_det[..., None, None]


def _inv6(M: jnp.ndarray) -> jnp.ndarray:
    """Batched 6x6 inverse via 3x3 block Schur complement on _inv3
    (line-endpoint landmark blocks)."""
    A = M[..., :3, :3]
    B = M[..., :3, 3:]
    C = M[..., 3:, :3]
    D = M[..., 3:, 3:]
    Ai = _inv3(A)
    S = D - C @ Ai @ B
    Si = _inv3(S)
    AiB = Ai @ B
    CAi = C @ Ai
    TL = Ai + AiB @ Si @ CAi
    TR = -AiB @ Si
    BL = -Si @ CAi
    return jnp.concatenate([jnp.concatenate([TL, TR], -1),
                            jnp.concatenate([BL, Si], -1)], -2)


def inv_blocks(A: jnp.ndarray) -> jnp.ndarray:
    """Dispatch batched small-SPD-block inversion to the closed forms."""
    d = A.shape[-1]
    if d == 3:
        return _inv3(A)
    if d == 6:
        return _inv6(A)
    return jnp.linalg.inv(A)


def _chol3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 Cholesky (lower L, A = L L^T): pure VPU
    arithmetic like _inv3 (jnp.linalg.cholesky lowers to scalarizing
    batched kernels on TPU).  Inputs must be damped SPD; sqrt args are
    floored to keep padded/identity blocks finite."""
    eps = 1e-20
    a11, a21, a31 = A[..., 0, 0], A[..., 1, 0], A[..., 2, 0]
    a22, a32, a33 = A[..., 1, 1], A[..., 2, 1], A[..., 2, 2]
    l11 = jnp.sqrt(jnp.maximum(a11, eps))
    l21 = a21 / l11
    l31 = a31 / l11
    l22 = jnp.sqrt(jnp.maximum(a22 - l21 * l21, eps))
    l32 = (a32 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(a33 - l31 * l31 - l32 * l32, eps))
    z = jnp.zeros_like(l11)
    return jnp.stack([jnp.stack([l11, z, z], -1),
                      jnp.stack([l21, l22, z], -1),
                      jnp.stack([l31, l32, l33], -1)], -2)


def _tri_inv3(L: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched lower-triangular 3x3 blocks."""
    l11, l21, l31 = L[..., 0, 0], L[..., 1, 0], L[..., 2, 0]
    l22, l32, l33 = L[..., 1, 1], L[..., 2, 1], L[..., 2, 2]
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i33 = 1.0 / l33
    i21 = -l21 * i11 * i22
    i32 = -l32 * i22 * i33
    i31 = (l21 * l32 - l31 * l22) * i11 * i22 * i33
    z = jnp.zeros_like(i11)
    return jnp.stack([jnp.stack([i11, z, z], -1),
                      jnp.stack([i21, i22, z], -1),
                      jnp.stack([i31, i32, i33], -1)], -2)


def chol_invT_blocks(A: jnp.ndarray) -> jnp.ndarray:
    """Batched factor F with F F^T = A^{-1} for damped-SPD 3x3 or 6x6
    blocks: F = (chol(A))^{-T}.

    Used for the GRAM-form Schur fill-in H - (B F)(B F)^T: computing
    the fill-in as one Gram matmul instead of B·A^{-1}·B^T keeps the
    f32 assembly error at the rounding level (measured 16 vs 2e7
    absolute on the windowed PL-BA reduced system, whose smallest
    eigenvalues sit BELOW the direct form's noise floor — the system
    went numerically indefinite and CG returned NaN at low damping)."""
    d = A.shape[-1]
    if d == 3:
        return jnp.swapaxes(_tri_inv3(_chol3(A)), -1, -2)
    if d == 6:
        A11 = A[..., :3, :3]
        A21 = A[..., 3:, :3]
        A22 = A[..., 3:, 3:]
        L11 = _chol3(A11)
        L11i = _tri_inv3(L11)
        L21 = A21 @ jnp.swapaxes(L11i, -1, -2)
        S22 = A22 - L21 @ jnp.swapaxes(L21, -1, -2)
        L22 = _chol3(S22)
        L22i = _tri_inv3(L22)
        # inv of [[L11,0],[L21,L22]] = [[L11i,0],[-L22i L21 L11i, L22i]]
        BLi = -L22i @ L21 @ L11i
        z = jnp.zeros_like(L11)
        Li = jnp.concatenate([
            jnp.concatenate([L11i, z], -1),
            jnp.concatenate([BLi, L22i], -1)], -2)
        return jnp.swapaxes(Li, -1, -2)
    # fallback: dense cholesky (host-grade sizes only)
    L = jnp.linalg.cholesky(A)
    return jnp.swapaxes(jnp.linalg.inv(L), -1, -2)


def _cg_solve(H: jnp.ndarray, g: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Fixed-trip-count conjugate gradients for the SPD reduced camera
    system — pure matmul/VPU arithmetic, MXU-friendly and safe inside
    lax.scan on every backend (see models/kernels.solve_spd_cg)."""
    x = jnp.zeros_like(g)
    r = g
    p = r
    rs = jnp.dot(r, r)

    def body(carry, _):
        x, r, p, rs = carry
        Hp = H @ p
        alpha = rs / jnp.maximum(jnp.dot(p, Hp), 1e-20)
        x = x + alpha * p
        r = r - alpha * Hp
        rs_new = jnp.dot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-20)
        p = r + beta * p
        return (x, r, p, rs_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rs), None, length=iters)
    return x


# --------------------------------------------------------------------------
# Problem: assembly + solve
# --------------------------------------------------------------------------

class Problem:
    """A nonlinear least-squares problem instance.

    states: dict name -> array [count, ...raw shape]
    dense block families declared with dof + retract; landmark families
    Schur-eliminated.  All counts/capacities static.
    """

    def __init__(self, linear_solver: str = "chol",
                 psum_axis: Optional[str] = None):
        self._dense: List[BlockDef] = []
        self._lm: Dict[str, LandmarkFamily] = {}
        self._retract: Dict[str, Callable] = {}
        self._dofs: Dict[str, int] = {}
        self.terms: List[Term] = []
        self.linear_solver = linear_solver   # "chol" | "cg"
        # Distributed exact solve (inside shard_map over `psum_axis`):
        # dense states replicated, landmark families + their observation
        # tables SHARDED per device.  Each device assembles its partial
        # dense system and Schur-eliminates its own landmarks; one psum
        # of the reduced (S x S) camera system makes the GN step EXACT —
        # the g2o BlockSolver's reduced system assembled across devices
        # (the dist_ba partition of SURVEY §2.3, generalized to any
        # Problem).  None = single-device behavior, bit-identical.
        self.psum_axis = psum_axis

    # -- declaration ------------------------------------------------------
    def add_dense(self, name: str, count: int, dof: int, retract: Callable):
        self._dense.append(BlockDef(name, count, dof))
        self._retract[name] = retract
        self._dofs[name] = dof

    def add_landmarks(self, name: str, count: int, dof: int, retract: Callable):
        self._lm[name] = LandmarkFamily(name, count, dof)
        self._retract[name] = retract
        self._dofs[name] = dof

    def add_term(self, term: Term):
        self.terms.append(term)

    # -- linearize one term ----------------------------------------------
    def _linearize(self, term: Term, states):
        refs = list(term.dense_refs) + ([term.lm_ref] if term.lm_ref else [])
        gathered = tuple(states[name][idx] for name, idx in refs)
        dofs = [self._dofs[name] for name, _ in refs]
        splits = np.cumsum(dofs)[:-1].tolist()
        n = int(np.sum(dofs))

        def f_single(delta_concat, blocks, const):
            deltas = tuple(jnp.split(delta_concat, splits)) if splits else (delta_concat,)
            return term.res_fn(blocks, deltas, const)

        K = refs[0][1].shape[0]
        zeros = jnp.zeros((K, n), jnp.float32)

        def r_and_J(delta, blocks, const):
            return f_single(delta, blocks, const), jax.jacfwd(f_single)(delta, blocks, const)

        r, J = jax.vmap(r_and_J)(zeros, gathered, term.const)
        r_w, J_w = _whiten(r, J, term.info)
        chi2 = jnp.sum(r_w * r_w, axis=-1)
        if term.robust_delta > 0:
            s = jnp.sqrt(jnp.maximum(chi2, 1e-18))
            w = jnp.minimum(1.0, term.robust_delta / s)
        else:
            w = jnp.ones_like(chi2)
        if term.mask is not None:
            w = w * term.mask.astype(w.dtype)
        return r_w, J_w, w, chi2, dofs

    # -- assemble + one damped GN step -----------------------------------
    def build_normal_equations(self, states):
        """Assemble dense H [S,S], g [S], landmark H_pp/g_p, coupling B.

        Returns (H, g, lm_sys, total_cost, chi2_by_term) where lm_sys maps
        landmark family -> (Hpp [P,dof,dof], gp [P,dof], B [S, P*dof]).
        """
        layout = DenseLayout(self._dense)
        S = max(layout.total, 1)
        H = jnp.zeros((S, S), jnp.float32)
        g = jnp.zeros((S,), jnp.float32)
        lm_sys = {name: [jnp.zeros((f.count, f.dof, f.dof), jnp.float32),
                         jnp.zeros((f.count, f.dof), jnp.float32),
                         jnp.zeros((S, f.count * f.dof), jnp.float32)]
                  for name, f in self._lm.items()}
        total_cost = jnp.float32(0.0)
        chi2_by_term = {}

        for term in self.terms:
            r, J, w, chi2, dofs = self._linearize(term, states)
            chi2_by_term[term.name] = chi2
            total_cost = total_cost + jnp.sum(w * chi2)
            Jw = J * w[:, None, None]
            nd = len(term.dense_refs)
            # split J into per-ref column groups
            col_splits = np.cumsum(dofs)[:-1].tolist()
            Jparts = jnp.split(J, col_splits, axis=2) if col_splits else [J]

            # dense x dense block products.  Single-ref terms (the
            # big per-observation families: reprojection edges etc.) go
            # through one-hot MXU matmuls + a block-diagonal placement —
            # per-observation scatter-adds serialize on TPU and were
            # measured to dominate assembly; multi-ref terms (inertial
            # chain edges — dozens, not thousands) keep the scatter.
            if nd == 1 and term.dense_refs[0][1].shape[0] >= 64:
                name_a, idx_a = term.dense_refs[0]
                fam = layout.blocks[name_a]
                off0 = layout.offsets[name_a]
                da = dofs[0]
                W1h = jax.nn.one_hot(idx_a, fam.count,
                                     dtype=jnp.float32)         # [K,C]
                Jaw = Jparts[0] * w[:, None, None]
                Hab = jnp.einsum("kdi,kdj->kij", Jaw, Jparts[0])
                Hk = jnp.einsum("kc,kij->cij", W1h, Hab)        # [C,da,da]
                gk = jnp.einsum("kc,ki->ci", W1h,
                                -jnp.einsum("kdi,kd->ki", Jaw, r))
                bd = jnp.einsum("cij,cd->cidj", Hk,
                                jnp.eye(fam.count, dtype=jnp.float32))
                n = fam.count * da
                H = H.at[off0:off0 + n, off0:off0 + n].add(
                    bd.reshape(n, n))
                g = g.at[off0:off0 + n].add(gk.reshape(n))
            else:
                for a in range(nd):
                    name_a, idx_a = term.dense_refs[a]
                    off_a = layout.offset_of(name_a, idx_a)      # [K]
                    da = dofs[a]
                    ga = -jnp.einsum("kdi,kd->ki",
                                     Jparts[a] * w[:, None, None], r)
                    rows = off_a[:, None] + jnp.arange(da)[None, :]
                    g = g.at[rows].add(ga)
                    for b in range(nd):
                        name_b, idx_b = term.dense_refs[b]
                        off_b = layout.offset_of(name_b, idx_b)
                        db = dofs[b]
                        Hab = jnp.einsum("kdi,kdj->kij",
                                         Jparts[a] * w[:, None, None],
                                         Jparts[b])              # [K,da,db]
                        rr = rows[:, :, None]
                        cc = (off_b[:, None]
                              + jnp.arange(db)[None, :])[:, None, :]
                        H = H.at[rr, cc].add(Hab)

            # landmark coupling
            if term.lm_ref is not None:
                lname, lidx = term.lm_ref
                fam = self._lm[lname]
                dl = fam.dof
                Jl = Jparts[nd]
                Hpp, gp, B = lm_sys[lname]
                Hll = jnp.einsum("kdi,kdj->kij", Jl * w[:, None, None], Jl)
                gl = -jnp.einsum("kdi,kd->ki", Jl * w[:, None, None], r)
                Hpp = Hpp.at[lidx].add(Hll)
                gp = gp.at[lidx].add(gl)
                for a in range(nd):
                    name_a, idx_a = term.dense_refs[a]
                    off_a = layout.offset_of(name_a, idx_a)
                    da = dofs[a]
                    Hal = jnp.einsum("kdi,kdj->kij", Jparts[a] * w[:, None, None], Jl)
                    rr = (off_a[:, None] + jnp.arange(da)[None, :])[:, :, None]
                    cc = (lidx[:, None] * dl + jnp.arange(dl)[None, :])[:, None, :]
                    B = B.at[rr, cc].add(Hal)
                lm_sys[lname] = [Hpp, gp, B]

        if self.psum_axis is not None:
            total_cost = jax.lax.psum(total_cost, self.psum_axis)
        return layout, H, g, lm_sys, total_cost, chi2_by_term

    def solve_step(self, states, lam: jnp.ndarray,
                   dense_free_mask: Optional[Dict[str, jnp.ndarray]] = None,
                   lm_free_mask: Optional[Dict[str, jnp.ndarray]] = None):
        """One damped step: returns (new_states, cost, chi2_by_term).

        dense_free_mask[name]: [count] bool — False freezes that block
        (the reference's `setFixed` vertices).  lm_free_mask likewise for
        landmarks (invalid/padded landmarks MUST be masked out).
        """
        layout, H, g, lm_sys, cost, chi2s = self.build_normal_equations(states)
        S = H.shape[0]

        free = jnp.ones((S,), jnp.float32)
        if dense_free_mask:
            for name, m in dense_free_mask.items():
                b = layout.blocks[name]
                fm = jnp.repeat(m.astype(jnp.float32), b.dof)
                free = free.at[layout.offsets[name]:
                               layout.offsets[name] + b.count * b.dof].set(fm)

        # LM damping (multiplicative on diagonal)
        diag = jnp.diagonal(H)
        H = H + jnp.diag(diag * lam + 1e-6)

        # Schur-eliminate each landmark family
        rhs = g
        schur_data = {}
        for name, (Hpp, gp, B) in lm_sys.items():
            fam = self._lm[name]
            lfree = None if not lm_free_mask else lm_free_mask.get(name)
            if lfree is not None:
                lf = lfree.astype(jnp.float32)
                Hpp = Hpp * lf[:, None, None]
                gp = gp * lf[:, None]
            dl = fam.dof
            dpp = jnp.einsum("pii->pi", Hpp)
            # scale-aware damping floor (g2o's tau*max(H_ii) analog,
            # per landmark block): landmark families have structural
            # null directions — a line endpoint sliding along its line,
            # a low-parallax point's depth — where the diagonal is ~0,
            # so multiplicative damping alone leaves the block inverse
            # ~1/eps.  Those huge Dinv entries amplify f32 cancellation
            # in the Schur fill-in until the reduced camera system goes
            # INDEFINITE and CG returns NaN (observed at lam<=3e-3 on
            # the windowed PL-BA).  Flooring at 1e-3 of the block's own
            # diagonal scale freezes null directions without biasing
            # well-constrained ones (1e-4: the Gram-form fill-in below
            # carries most of the stability; the floor only has to keep
            # the factor bounded).
            floor = 1e-4 * jnp.mean(dpp, axis=-1, keepdims=True)
            Hpp_d = Hpp + jax.vmap(jnp.diag)(dpp * lam + floor + 1e-6)
            # mask out empty landmarks so inverse is safe
            occupied = dpp.sum(-1) > 1e-9
            if lfree is not None:
                occupied = occupied & lfree
            eye = jnp.eye(dl, dtype=jnp.float32)
            Hpp_d = jnp.where(occupied[:, None, None], Hpp_d, eye[None])
            # GRAM-form fill-in: F F^T = Hpp_d^{-1}, G = B F, and the
            # fill-in is the single Gram matmul G G^T — measured 1e6x
            # lower f32 assembly error than B·Dinv·B^T (whose noise
            # floor exceeded the reduced system's smallest eigenvalues:
            # numerically indefinite -> CG NaN at low damping).
            Ffac = chol_invT_blocks(Hpp_d)
            # conditioning guard: a rank-deficient block that slips
            # past the occupied gate yields a garbage (huge or
            # non-finite) factor at low damping — one such block NaNs
            # the whole step.  Hold those landmarks fixed for this
            # iteration instead (LM raises damping on the retry).
            blk_ok = jnp.all(jnp.isfinite(Ffac), axis=(-2, -1)) \
                & (jnp.max(jnp.abs(Ffac), axis=(-2, -1)) < 1e3)
            occupied = occupied & blk_ok
            Ffac = jnp.where(occupied[:, None, None], Ffac, 0.0)
            Dinv = jnp.einsum("pij,pkj->pik", Ffac, Ffac)
            B3 = B.reshape(S, fam.count, dl)
            if lfree is not None:
                B3 = B3 * lfree.astype(jnp.float32)[None, :, None]
            G = jnp.einsum("spi,pij->spj", B3, Ffac)
            Gm = G.reshape(S, fam.count * dl)
            H = H - jax.lax.dot(Gm, Gm.T,
                                precision=jax.lax.Precision.HIGH)
            rhs = rhs - jnp.einsum(
                "spj,pj->s", G, jnp.einsum("pij,pi->pj", Ffac, gp))
            schur_data[name] = (Dinv, B3, gp, occupied)

        # freeze fixed dense blocks AFTER the reduction: zero their
        # rows/cols in the reduced system, unit diagonal, zero rhs —
        # otherwise Schur fill-in re-couples fixed blocks into the solve
        H = H * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        rhs = rhs * free

        if self.psum_axis is not None:
            # one collective per GN iteration: the Schur-reduced dense
            # system is a SUM over observations, so psum of the
            # per-device partials (damping diag*lam sums to the global
            # diag*lam) reconstructs the exact global reduced system
            H = jax.lax.psum(H, self.psum_axis)
            rhs = jax.lax.psum(rhs, self.psum_axis)

        if self.linear_solver == "cg":
            # fixed-iteration CG on the SPD reduced system: plain VPU
            # arithmetic (no LAPACK-style factorization — those compile
            # pathologically on the experimental axon TPU backend)
            dx = _cg_solve(H, rhs, iters=min(max(S // 2, 16), 128))
        else:
            dx = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(H, lower=True), rhs)
        dx = dx * free

        # back-substitute landmarks
        new_states = dict(states)
        for name, (Dinv, B3, gp, occupied) in schur_data.items():
            fam = self._lm[name]
            rhs_p = gp - jnp.einsum("spi,s->pi", B3, dx)
            dxp = jnp.einsum("pij,pj->pi", Dinv, rhs_p)
            dxp = dxp * occupied[:, None]
            new_states[name] = self._retract[name](states[name], dxp)

        for bd in self._dense:
            d = layout.slice_delta(dx, bd.name)
            new_states[bd.name] = self._retract[bd.name](states[bd.name], d)

        return new_states, cost, chi2s

    def _residuals_only(self, term: Term, states):
        """Evaluate a term's whitened chi2 WITHOUT Jacobians — cost
        evaluation inside the LM accept/reject loop doesn't need J, and
        jacfwd with n tangents costs ~n residual evaluations."""
        refs = list(term.dense_refs) + ([term.lm_ref] if term.lm_ref else [])
        gathered = tuple(states[name][idx] for name, idx in refs)
        dofs = [self._dofs[name] for name, _ in refs]
        splits = np.cumsum(dofs)[:-1].tolist()
        n = int(np.sum(dofs))
        K = refs[0][1].shape[0]
        zeros = jnp.zeros((K, n), jnp.float32)

        def f_single(delta_concat, blocks, const):
            deltas = tuple(jnp.split(delta_concat, splits)) if splits \
                else (delta_concat,)
            return term.res_fn(blocks, deltas, const)

        r = jax.vmap(f_single)(zeros, gathered, term.const)
        if term.info is not None:
            info = term.info
            if info.ndim == 1:
                r = r * jnp.sqrt(info)[:, None]
            elif info.ndim == 2:
                r = r * jnp.sqrt(info)
            else:
                L = jnp.linalg.cholesky(info)
                r = jnp.einsum("kij,kj->ki", jnp.swapaxes(L, -1, -2), r)
        chi2 = jnp.sum(r * r, axis=-1)
        if term.robust_delta > 0:
            s = jnp.sqrt(jnp.maximum(chi2, 1e-18))
            w = jnp.minimum(1.0, term.robust_delta / s)
        else:
            w = jnp.ones_like(chi2)
        if term.mask is not None:
            w = w * term.mask.astype(w.dtype)
        return w, chi2

    def cost(self, states):
        total = jnp.float32(0.0)
        chi2s = {}
        for term in self.terms:
            w, chi2 = self._residuals_only(term, states)
            chi2s[term.name] = chi2
            total = total + jnp.sum(w * chi2)
        if self.psum_axis is not None:
            total = jax.lax.psum(total, self.psum_axis)
        return total, chi2s


def optimize(problem: Problem, states, iters: int = 10, lam0: float = 1e-4,
             dense_free_mask=None, lm_free_mask=None,
             early_tol: float = 0.0):
    """Fixed-trip-count LM loop with branchless accept/reject.

    Mirrors `optimizer.optimize(n)` (reference pattern used ~40x in
    src/Optimizer.cc).  Returns (states, final cost, chi2_by_term).

    Each iteration evaluates the cost after the step and rolls back bad
    steps (2 linearizations per iteration).  A deferred-accept variant
    (one linearization per iteration) was tried and removed: its
    reject->re-accept cycle halves the damping right after raising it,
    so damping never grows and hard BA problems stall.

    `early_tol > 0` turns the scan into a device-side while_loop that
    exits once an ACCEPTED step improves the cost by less than
    `early_tol` relative (g2o's terminate-action analog: the reference's
    optimize(n) also stops early on chi2 stagnation).  Warm-started
    incremental window BA — re-solved every keyframe on an
    almost-converged window — then costs 2-4 linearizations instead of
    the full budget, which is the mapping-step hot path.  Rejected
    steps never exit (they raise damping and retry)."""

    def body(carry, _):
        states, lam, cost_prev = carry
        new_states, cost_lin, chi2s = problem.solve_step(
            states, lam, dense_free_mask, lm_free_mask)
        new_cost, _ = problem.cost(new_states)
        accept_ = new_cost < cost_prev
        states_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(accept_, a, b), new_states, states)
        lam_out = jnp.where(accept_, lam * 0.5, lam * 4.0)
        lam_out = jnp.clip(lam_out, 1e-8, 1e4)
        cost_out = jnp.where(accept_, new_cost, cost_prev)
        return (states_out, lam_out, cost_out), None

    cost0, _ = problem.cost(states)
    if early_tol > 0.0:
        # the done flag is carried as FLOAT, not bool: bool loop
        # carries miscompile on the axon TPU backend (same reason the
        # LM accept/reject gates are branchless float selects)
        def w_cond(carry):
            _, _, _, i, done = carry
            return (i < iters) & (done < 0.5)

        def w_body(carry):
            st, lam, cost_prev, i, _ = carry
            new_states, _, _ = problem.solve_step(
                st, lam, dense_free_mask, lm_free_mask)
            new_cost, _ = problem.cost(new_states)
            accept_ = new_cost < cost_prev
            st2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept_, a, b), new_states, st)
            lam2 = jnp.clip(jnp.where(accept_, lam * 0.5, lam * 4.0),
                            1e-8, 1e4)
            cost2 = jnp.where(accept_, new_cost, cost_prev)
            # exit on a FLAT landscape: the ATTEMPTED step changed the
            # cost by < tol relative, whether accepted (tiny
            # improvement) or rejected-but-close (converged: near the
            # optimum LM keeps REJECTING steps, so an accepted-only
            # exit test would burn the whole budget exactly when the
            # solve is warm).  A rejected OVERSHOOT (cost blew up) has
            # a large |delta| and keeps iterating with higher damping.
            rel = jnp.abs(new_cost - cost_prev) \
                / jnp.maximum(cost_prev, 1e-20)
            done = jnp.where(rel < early_tol, 1.0, 0.0)
            return (st2, lam2, cost2, i + 1, done)

        states, lam, cost, _, _ = jax.lax.while_loop(
            w_cond, w_body,
            (states, jnp.float32(lam0), cost0, jnp.int32(0),
             jnp.float32(0.0)))
    else:
        (states, lam, cost), _ = jax.lax.scan(
            body, (states, jnp.float32(lam0), cost0), None, length=iters)
    final_cost, chi2s = problem.cost(states)
    return states, final_cost, chi2s


# ---------------------------------------------------------------------------
# Marginalization helpers (reference Optimizer::Marginalize / Condition /
# Sparsify, include/Optimizer.h:152-156, src/Optimizer.cc tail) — used to
# turn an information matrix over [kept | marginalized] variables into a
# prior over the kept ones.  All three are jittable pure functions over
# dense (H, b); variable selection is by index block [start, end).
# ---------------------------------------------------------------------------

def _split(H, b, start, end):
    n = H.shape[0]
    keep = jnp.concatenate([jnp.arange(0, start), jnp.arange(end, n)])
    marg = jnp.arange(start, end)
    return keep, marg


def marginalize(H: jnp.ndarray, b: jnp.ndarray, start: int, end: int):
    """Schur-complement variables [start, end) out of the system
    (H, b): H' = H_kk - H_km H_mm^+ H_mk, b' = b_k - H_km H_mm^+ b_m.
    The marginalized block uses a pseudo-inverse via eigen-decomposition
    (the reference does the same with an SVD threshold) so rank-deficient
    priors stay valid.  Returns (H', b') of reduced size."""
    keep, marg = _split(H, b, start, end)
    Hkk = H[jnp.ix_(keep, keep)]
    Hkm = H[jnp.ix_(keep, marg)]
    Hmm = H[jnp.ix_(marg, marg)]
    bm = b[marg]
    Hmm = 0.5 * (Hmm + Hmm.T)
    w, V = jnp.linalg.eigh(Hmm)
    w_inv = jnp.where(w > 1e-8 * jnp.max(jnp.abs(w)), 1.0 / w, 0.0)
    Hmm_inv = (V * w_inv[None, :]) @ V.T
    H_out = Hkk - Hkm @ Hmm_inv @ Hkm.T
    b_out = b[keep] - Hkm @ (Hmm_inv @ bm)
    return 0.5 * (H_out + H_out.T), b_out


def condition(H: jnp.ndarray, b: jnp.ndarray, start: int, end: int):
    """Condition on variables [start, end): treat them as fixed at the
    linearization point — simply drop their rows/columns (reference
    Optimizer::Condition)."""
    keep, _ = _split(H, b, start, end)
    return H[jnp.ix_(keep, keep)], b[keep]


def sparsify(H: jnp.ndarray, block: int):
    """Block-diagonal (Markov-blanket) approximation of an information
    matrix: keep `block`-sized diagonal blocks, zero the cross terms
    (reference Optimizer::Sparsify keeps the selected sparsity pattern).
    The result is the closest block-diagonal matrix in Frobenius norm."""
    n = H.shape[0]
    ids = jnp.arange(n) // block
    mask = (ids[:, None] == ids[None, :]).astype(H.dtype)
    return H * mask
