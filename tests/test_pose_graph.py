"""Essential-graph Sim3 optimization: loop-closure drift correction
(reference Optimizer::OptimizeEssentialGraph, src/Optimizer.cc:6952)."""
import numpy as np
import jax.numpy as jnp

from plvio_tpu.models import kernels as KN
from plvio_tpu.solver import residuals as RES
from plvio_tpu.utils import lie


def test_loop_drift_correction(rng):
    """KFs around a circle; odometry edges carry accumulated drift
    (rotation+translation+scale); a loop edge ties last to first with the
    true relative pose.  After optimization the chain should match ground
    truth much better than before."""
    n = 12
    # ground-truth poses on a circle (T_iw world->kf)
    angles = np.linspace(0, 2 * np.pi * (n - 1) / n, n)
    R_wk, p_wk = [], []
    for a in angles:
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        R_wk.append(R)
        p_wk.append(np.array([2 * c, 2 * s, 0.0]))
    # convert to S_iw = (R_iw, t_iw, 1)
    gt = []
    for R, p in zip(R_wk, p_wk):
        R_iw = R.T
        t_iw = -R_iw @ p
        gt.append((R_iw, t_iw, 1.0))

    # odometry measurements S_ji between consecutive: from GT
    def rel(a, b):
        """S_ba = S_b * S_a^{-1}."""
        Ra, ta, sa = a
        Rb, tb, sb = b
        Rai, tai, sai = np.asarray(Ra).T, None, 1.0 / sa
        Rai2, tai2, sai2 = lie.sim3_inv(jnp.asarray(Ra, jnp.float32),
                                        jnp.asarray(ta, jnp.float32),
                                        jnp.asarray(sa, jnp.float32))
        R, t, s = lie.sim3_mul(jnp.asarray(Rb, jnp.float32),
                               jnp.asarray(tb, jnp.float32),
                               jnp.asarray(sb, jnp.float32),
                               Rai2, tai2, sai2)
        return np.asarray(R), np.asarray(t), float(s)

    # drifted estimates: accumulate odometry with per-step perturbation
    est = [gt[0]]
    for i in range(1, n):
        Rji, tji, sji = rel(gt[i - 1], gt[i])
        # inject drift
        dw = rng.normal(0, 0.02, 3)
        dR = np.asarray(lie.so3_exp(jnp.asarray(dw, jnp.float32)))
        Rji_d = dR @ Rji
        tji_d = tji + rng.normal(0, 0.05, 3)
        sji_d = sji * np.exp(rng.normal(0, 0.02))
        R_prev, t_prev, s_prev = est[-1]
        R, t, s = lie.sim3_mul(jnp.asarray(Rji_d, jnp.float32),
                               jnp.asarray(tji_d, jnp.float32),
                               jnp.asarray(sji_d, jnp.float32),
                               jnp.asarray(R_prev, jnp.float32),
                               jnp.asarray(t_prev, jnp.float32),
                               jnp.asarray(s_prev, jnp.float32))
        est.append((np.asarray(R), np.asarray(t), float(s)))

    def center(S):
        R, t, s = S
        return -(np.asarray(R).T @ np.asarray(t)) / s

    drift_before = np.linalg.norm(center(est[-1]) - center(gt[-1]))

    # build the problem: consecutive edges use the DRIFTED odometry (their
    # own relative measurements), plus one loop edge last->first from GT
    cap_kf, cap_e = 16, 32
    states = np.zeros((cap_kf, 13), np.float32)
    for i in range(n):
        R, t, s = est[i]
        states[i] = np.concatenate([np.asarray(R).reshape(-1),
                                    np.asarray(t), [s]])
    edge_i, edge_j, Rjis, tjis, sjis = [], [], [], [], []
    for i in range(1, n):
        # measurement = relative pose of the DRIFTED estimates (consistent
        # with initialization, so these edges are satisfied initially).
        # Edge residual is log(S_ji S_i S_j^-1), zero when S_ji = S_j S_i^-1
        Rji, tji, sji = rel(est[i], est[i - 1])
        edge_i.append(i)
        edge_j.append(i - 1)
        Rjis.append(Rji)
        tjis.append(tji)
        sjis.append(sji)
    # loop edge: true relative between KF n-1 and KF 0
    Rji, tji, sji = rel(gt[n - 1], gt[0])
    edge_i.append(n - 1)
    edge_j.append(0)
    Rjis.append(Rji)
    tjis.append(tji)
    sjis.append(sji)

    ne = len(edge_i)
    pad_e = lambda a, fill=0: np.concatenate(
        [np.asarray(a), np.full((cap_e - ne,) + np.asarray(a).shape[1:],
                                fill, np.asarray(a).dtype)])
    kf_free = np.zeros(cap_kf, bool)
    kf_free[1:n] = True

    run = KN.make_pose_graph_optimizer(cap_kf, cap_e, iters=20)
    out = run(jnp.asarray(states), jnp.asarray(kf_free),
              jnp.asarray(pad_e(np.asarray(edge_i, np.int32))),
              jnp.asarray(pad_e(np.asarray(edge_j, np.int32))),
              jnp.asarray(pad_e(np.stack(Rjis).astype(np.float32))),
              jnp.asarray(pad_e(np.stack(tjis).astype(np.float32))),
              jnp.asarray(pad_e(np.asarray(sjis, np.float32), 1.0)),
              jnp.asarray(np.concatenate([np.ones(ne, bool),
                                          np.zeros(cap_e - ne, bool)])),
              jnp.asarray(np.concatenate([np.ones(ne - 1), [100.0],
                                          np.zeros(cap_e - ne)]),
                          jnp.float32))
    out = np.asarray(out)
    est_after = [(out[i, :9].reshape(3, 3), out[i, 9:12], out[i, 12])
                 for i in range(n)]
    drift_after = np.linalg.norm(center(est_after[-1]) - center(gt[-1]))
    assert drift_before > 0.1, drift_before  # the test must be nontrivial
    assert drift_after < 0.35 * drift_before, (drift_before, drift_after)
    # scales pulled back toward 1
    scales = np.array([s for _, _, s in est_after[:n]])
    assert np.abs(np.log(scales)).max() < 0.1


def test_loop_drift_correction_4dof(rng):
    """Inertial pose graph (reference OptimizeEssentialGraph4DoF,
    src/Optimizer.cc:14411): drift injected only in yaw+translation;
    the 4-DoF optimizer corrects it while provably leaving scale at 1
    and roll/pitch untouched (gravity consistency)."""
    n = 12
    angles = np.linspace(0, 2 * np.pi * (n - 1) / n, n)
    gt = []
    for a in angles:
        c, s = np.cos(a), np.sin(a)
        R_wk = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        p_wk = np.array([2 * c, 2 * s, 0.0])
        R_iw = R_wk.T
        gt.append((R_iw, -R_iw @ p_wk, 1.0))

    def rel(a, b):
        Ra, ta, sa = [jnp.asarray(np.asarray(x), jnp.float32) for x in a]
        Rb, tb, sb = [jnp.asarray(np.asarray(x), jnp.float32) for x in b]
        Rai, tai, sai = lie.sim3_inv(Ra, ta, sa)
        R, t, s = lie.sim3_mul(Rb, tb, sb, Rai, tai, sai)
        return np.asarray(R), np.asarray(t), float(s)

    # drifted estimates: accumulate odometry with YAW-only rotation drift
    est = [gt[0]]
    for i in range(1, n):
        Rji, tji, sji = rel(gt[i - 1], gt[i])
        dyaw = rng.normal(0, 0.03)
        dR = np.asarray(lie.so3_exp(jnp.asarray([0, 0, dyaw], jnp.float32)))
        R_prev, t_prev, s_prev = est[-1]
        R, t, s = lie.sim3_mul(
            jnp.asarray(dR @ Rji, jnp.float32),
            jnp.asarray(tji + rng.normal(0, 0.05, 3), jnp.float32),
            jnp.asarray(sji, jnp.float32),
            jnp.asarray(R_prev, jnp.float32),
            jnp.asarray(t_prev, jnp.float32),
            jnp.asarray(np.float32(s_prev)))
        est.append((np.asarray(R), np.asarray(t), float(s)))

    def center(S):
        R, t, s = S
        return -(np.asarray(R).T @ np.asarray(t)) / s

    drift_before = np.linalg.norm(center(est[-1]) - center(gt[-1]))

    cap_kf, cap_e = 16, 32
    states = np.zeros((cap_kf, 13), np.float32)
    for i in range(n):
        R, t, s = est[i]
        states[i] = np.concatenate([R.reshape(-1), t, [s]])
    edge_i, edge_j, Rjis, tjis, sjis = [], [], [], [], []
    for i in range(1, n):
        Rji, tji, sji = rel(est[i], est[i - 1])
        edge_i.append(i); edge_j.append(i - 1)
        Rjis.append(Rji); tjis.append(tji); sjis.append(sji)
    Rji, tji, sji = rel(gt[n - 1], gt[0])
    edge_i.append(n - 1); edge_j.append(0)
    Rjis.append(Rji); tjis.append(tji); sjis.append(sji)

    ne = len(edge_i)
    pad_e = lambda a, fill=0: np.concatenate(
        [np.asarray(a), np.full((cap_e - ne,) + np.asarray(a).shape[1:],
                                fill, np.asarray(a).dtype)])
    kf_free = np.zeros(cap_kf, bool)
    kf_free[1:n] = True

    run = KN.make_pose_graph_optimizer(cap_kf, cap_e, iters=20,
                                       four_dof=True)
    out = run(jnp.asarray(states), jnp.asarray(kf_free),
              jnp.asarray(pad_e(np.asarray(edge_i, np.int32))),
              jnp.asarray(pad_e(np.asarray(edge_j, np.int32))),
              jnp.asarray(pad_e(np.stack(Rjis).astype(np.float32))),
              jnp.asarray(pad_e(np.asarray(tjis, np.float32))),
              jnp.asarray(pad_e(np.asarray(sjis, np.float32), 1.0)),
              jnp.asarray(np.concatenate([np.ones(ne, bool),
                                          np.zeros(cap_e - ne, bool)])),
              jnp.asarray(np.concatenate([np.ones(ne - 1), [100.0],
                                          np.zeros(cap_e - ne)]),
                          jnp.float32))
    out = np.asarray(out)
    est_after = [(out[i, :9].reshape(3, 3), out[i, 9:12], out[i, 12])
                 for i in range(n)]
    drift_after = np.linalg.norm(center(est_after[-1]) - center(gt[-1]))
    assert drift_before > 0.1, drift_before
    assert drift_after < 0.35 * drift_before, (drift_before, drift_after)
    # scale provably untouched
    scales = np.array([s for _, _, s in est_after[:n]])
    np.testing.assert_allclose(scales, 1.0, atol=1e-5)
    # roll/pitch of every KF unchanged: world z expressed in kf frame
    # (R_iw @ z) must match the initial estimate exactly
    for i in range(n):
        z_before = est[i][0] @ np.array([0, 0, 1.0])
        z_after = est_after[i][0] @ np.array([0, 0, 1.0])
        np.testing.assert_allclose(z_after, z_before, atol=1e-4)
