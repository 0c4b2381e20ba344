"""TUM-format trajectory IO and ATE/RPE evaluation.

Writers mirror the reference's trajectory savers
(reference: src/System.cc:785 SaveTrajectoryEuRoC,
:907 SaveKeyFrameTrajectoryEuRoC, :959 SaveKeyFrameTrajectoryByRelocalization):
one line per pose, `t tx ty tz qx qy qz qw`, timestamps in seconds with 9
decimals.  Evaluation implements the standard TUM/evo ATE (Umeyama
Sim3/SE3 alignment + RMSE) and RPE — the reference has no built-in
evaluator (SURVEY §4: evaluation was external).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..utils import lie
import jax.numpy as jnp


@dataclass
class Trajectory:
    timestamps: np.ndarray  # [N]
    positions: np.ndarray   # [N,3]
    quaternions: np.ndarray  # [N,4] (x,y,z,w)

    def __len__(self):
        return len(self.timestamps)

    @property
    def rotations(self) -> np.ndarray:
        return np.asarray(lie.quat_to_rot(jnp.asarray(self.quaternions, jnp.float32)),
                          np.float64)


def write_tum(path: str, traj: Trajectory) -> None:
    with open(path, "w") as f:
        for t, p, q in zip(traj.timestamps, traj.positions, traj.quaternions):
            f.write(f"{t:.9f} {p[0]:.7f} {p[1]:.7f} {p[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")


def read_tum(path: str) -> Trajectory:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(x) for x in line.replace(",", " ").split()]
            if len(vals) >= 8:
                rows.append(vals[:8])
    arr = np.asarray(rows, np.float64)
    return Trajectory(arr[:, 0], arr[:, 1:4], arr[:, 4:8])


def associate(t_a: np.ndarray, t_b: np.ndarray, max_dt: float = 0.02):
    """Nearest-timestamp association; returns index pairs (ia, ib)."""
    ib = np.searchsorted(t_b, t_a)
    ib = np.clip(ib, 0, len(t_b) - 1)
    ib_prev = np.clip(ib - 1, 0, len(t_b) - 1)
    use_prev = np.abs(t_b[ib_prev] - t_a) < np.abs(t_b[ib] - t_a)
    ib = np.where(use_prev, ib_prev, ib)
    ok = np.abs(t_b[ib] - t_a) <= max_dt
    ia = np.nonzero(ok)[0]
    return ia, ib[ok]


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity aligning src -> dst.  Returns (s, R, t)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est: Trajectory, gt: Trajectory, with_scale: bool = True,
             max_dt: float = 0.02) -> float:
    """Absolute trajectory error RMSE after Umeyama alignment (evo-style)."""
    ia, ib = associate(est.timestamps, gt.timestamps, max_dt)
    if len(ia) < 3:
        return float("inf")
    p_est, p_gt = est.positions[ia], gt.positions[ib]
    # a diverged dead-reckoned stretch can leave non-finite estimates;
    # those frames score as errors via the caller's tracked-frame count,
    # but they must not blow up the alignment SVD
    finite = np.isfinite(p_est).all(-1)
    if finite.sum() < 3:
        return float("inf")
    p_est, p_gt = p_est[finite], p_gt[finite]
    s, R, t = umeyama(p_est, p_gt, with_scale)
    aligned = (s * (R @ p_est.T)).T + t
    err = aligned - p_gt
    return float(np.sqrt((err ** 2).sum(-1).mean()))


def rpe_rmse(est: Trajectory, gt: Trajectory, delta: int = 1,
             max_dt: float = 0.02) -> float:
    """Relative pose (translation) error RMSE over `delta`-frame intervals."""
    ia, ib = associate(est.timestamps, gt.timestamps, max_dt)
    if len(ia) < delta + 2:
        return float("inf")
    Re, Rg = est.rotations[ia], gt.rotations[ib]
    pe, pg = est.positions[ia], gt.positions[ib]
    errs = []
    for i in range(len(ia) - delta):
        j = i + delta
        de = Re[i].T @ (pe[j] - pe[i])
        dg = Rg[i].T @ (pg[j] - pg[i])
        errs.append(de - dg)
    errs = np.asarray(errs)
    return float(np.sqrt((errs ** 2).sum(-1).mean()))
