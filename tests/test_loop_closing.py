"""Loop closing end-to-end on a hand-built drifted circular map:
detection via BoW, Sim3 verification, correction + essential graph."""
import numpy as np
import jax.numpy as jnp

from plvio_tpu.config import SystemConfig, CameraConfig
from plvio_tpu.models.mapstore import Atlas, MapStore
from plvio_tpu.models.kfdb import KeyFrameDatabase
from plvio_tpu.models.loop_closing import LoopCloser
from plvio_tpu.models import vocabulary as V
from plvio_tpu.ops import matching as M
from plvio_tpu.utils import lie


def _build_drifted_loop_map(rng, n_kf=16, drift=0.25):
    """KFs around a circle looking outward; last KF returns to the first
    pose but the whole chain has accumulated translation drift.  Every
    3D point has one persistent random descriptor."""
    cfg = CameraConfig(dist=(0., 0., 0., 0.))
    fx, fy, cx, cy = cfg.fx, cfg.fy, cfg.cx, cfg.cy
    n_feat = 256
    m = MapStore(max_kf=64, max_pts=4096, max_lines=64, n_feat=n_feat)

    # world points on a cylinder wall around the circle
    n_pts = 1200
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    pts_w = np.stack([3.0 * np.cos(ang), 3.0 * np.sin(ang),
                      rng.uniform(-1.5, 1.5, n_pts)], -1)
    descs = rng.choice([-1.0, 1.0], (n_pts, 256)).astype(np.float32)
    descs_packed = np.asarray(M.pack_bits_u32(jnp.asarray(descs, jnp.bfloat16)))

    pt_ids = m.alloc_points(n_pts)
    m.pt_xyz[pt_ids] = pts_w.astype(np.float32)
    m.pt_desc[pt_ids] = descs_packed
    m.pt_n_obs[pt_ids] = 2

    # true poses around the circle; drift grows linearly with index
    kf_angles = np.linspace(0, 2 * np.pi, n_kf, endpoint=False)
    kf_angles = np.concatenate([kf_angles, [0.0]])   # last revisits first
    kf_list = []
    for i, a in enumerate(kf_angles):
        c, s = np.cos(a), np.sin(a)
        p_true = np.array([1.2 * c, 1.2 * s, 0.0])
        look = np.array([c, s, 0.0])
        x = np.cross([0, 0, -1.0], look)
        x /= np.linalg.norm(x)
        y = np.cross(look, x)
        R_wc = np.stack([x, y, look], -1)
        # drifted estimate
        d = drift * i / len(kf_angles)
        p_est = p_true + np.array([d, -0.5 * d, 0.0])
        R_cw = R_wc.T
        t_cw = -R_cw @ p_est
        kf = m.alloc_kf()
        m.kf_timestamp[kf] = i * 0.5
        m.kf_pose_cw[kf] = np.concatenate(
            [R_cw, t_cw[:, None]], 1).astype(np.float32)
        if i > 0:
            m.kf_prev[kf] = kf_list[-1]
            m.kf_next[kf_list[-1]] = kf
        # observations: project TRUE pose onto TRUE points, bind the
        # nearest n_feat visible points; map positions use the DRIFTED
        # frame for the recent half (simulating drifted triangulation)
        pc = (pts_w - (-R_wc @ (R_cw @ p_true))) @ R_cw.T  # dummy
        pc = (pts_w @ R_cw.T) + (-R_cw @ p_true)
        z = pc[:, 2]
        uv = np.stack([fx * pc[:, 0] / np.maximum(z, 1e-6) + cx,
                       fy * pc[:, 1] / np.maximum(z, 1e-6) + cy], -1)
        vis = (z > 0.3) & (uv[:, 0] > 10) & (uv[:, 0] < 742) \
            & (uv[:, 1] > 10) & (uv[:, 1] < 470)
        sel = np.nonzero(vis)[0][:n_feat]
        m.kf_feat_uv[kf, :len(sel)] = uv[sel]
        m.kf_feat_desc[kf, :len(sel)] = descs_packed[sel]
        m.kf_feat_valid[kf, :len(sel)] = True
        if i >= len(kf_angles) - 2:
            # the revisiting KFs observe DUPLICATE drifted landmarks, as
            # freshly triangulated points in the drifted frame would —
            # they share no map points with the loop side (that is the
            # whole reason loop closure is needed)
            dup = m.alloc_points(len(sel))
            m.pt_xyz[dup] = (pts_w[sel][:len(dup)]
                             + np.array([d, -0.5 * d, 0.0])).astype(np.float32)
            m.pt_desc[dup] = descs_packed[sel][:len(dup)]
            m.pt_n_obs[dup] = 2
            m.kf_match_pt[kf, :len(dup)] = dup
        else:
            m.kf_match_pt[kf, :len(sel)] = pt_ids[sel]
        kf_list.append(kf)
    for kf in kf_list:
        m.update_covisibility(kf)
    return m, kf_list, kf_angles


def test_loop_close_on_drifted_circle(rng):
    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       use_lines=False)
    m, kf_list, kf_angles = _build_drifted_loop_map(rng)
    atlas = Atlas(maps=[m], active=0)
    voc = V.random_vocabulary(seed=0)
    kfdb = KeyFrameDatabase(voc, m.max_kf, m.n_feat)
    for kf in kf_list:
        kfdb.add_keyframe(kf, m.kf_feat_desc[kf], m.kf_feat_valid[kf])
    lc = LoopCloser(cfg, atlas, kfdb, m.n_feat, pg_kf_cap=64, pg_edge_cap=256)

    # feed the last few KFs to accumulate temporal-consistency votes
    closed = False
    for kf in kf_list[-4:]:
        closed = lc.process_keyframe(kf) or closed
    assert closed, "loop was not detected/closed"

    # after correction, the revisit KF pose should be near the first KF
    def center(k):
        R = m.kf_pose_cw[k, :, :3]
        t = m.kf_pose_cw[k, :, 3]
        return -R.T @ t
    err_after = np.linalg.norm(center(kf_list[-1]) - center(kf_list[0]))
    assert err_after < 0.12, err_after


def test_chained_gba_moves_every_keyframe(rng):
    """Maps beyond the single-kernel GBA capacity run the chain-
    partitioned block-Schwarz schedule instead of truncating to the
    newest KFs (reference runs its GBA over ALL keyframes,
    src/Optimizer.cc:78): every keyframe must move toward the optimum,
    including the oldest ones the old truncation skipped."""
    from plvio_tpu.config import SystemConfig, CameraConfig
    from plvio_tpu.models.mapstore import Atlas, MapStore
    from plvio_tpu.models.kfdb import KeyFrameDatabase
    from plvio_tpu.models.loop_closing import LoopCloser
    from plvio_tpu.models import vocabulary as V
    from plvio_tpu.ops import matching as M

    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    n_feat, n_kf, n_pts = 128, 48, 3000
    m = MapStore(max_kf=64, max_pts=8192, max_lines=8, n_feat=n_feat)
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    pts_w = np.stack([3.0 * np.cos(ang), 3.0 * np.sin(ang),
                      rng.uniform(-1.5, 1.5, n_pts)], -1)
    pt_ids = m.alloc_points(n_pts)
    m.pt_xyz[pt_ids] = pts_w.astype(np.float32)
    m.pt_n_obs[pt_ids] = 3

    true_poses = []
    prev = None
    for i, a in enumerate(np.linspace(0, 2 * np.pi, n_kf, endpoint=False)):
        c, s = np.cos(a), np.sin(a)
        p = np.array([1.2 * c, 1.2 * s, 0.0])
        look = np.array([c, s, 0.0])
        x = np.cross([0, 0, -1.0], look)
        x /= np.linalg.norm(x)
        y = np.cross(look, x)
        R_cw = np.stack([x, y, look], -1).T
        t_cw = -R_cw @ p
        kf = m.alloc_kf()
        m.kf_timestamp[kf] = 0.5 * i
        # observations from the TRUE pose
        pc = pts_w @ R_cw.T + t_cw
        z = pc[:, 2]
        uv = np.stack([fx * pc[:, 0] / np.maximum(z, 1e-6) + cx,
                       fy * pc[:, 1] / np.maximum(z, 1e-6) + cy], -1)
        vis = (z > 0.3) & (uv[:, 0] > 10) & (uv[:, 0] < 742) \
            & (uv[:, 1] > 10) & (uv[:, 1] < 470)
        sel = np.nonzero(vis)[0][:n_feat]
        m.kf_feat_uv[kf, :len(sel)] = uv[sel]
        m.kf_feat_uv_raw[kf, :len(sel)] = uv[sel]
        m.kf_feat_valid[kf, :len(sel)] = True
        m.kf_match_pt[kf, :len(sel)] = pt_ids[sel]
        # stored pose: perturbed everywhere (incl. the OLDEST KFs)
        dR = np.asarray(lie.so3_exp(jnp.asarray(
            rng.normal(0, 0.01, 3), jnp.float32)))
        m.kf_pose_cw[kf, :, :3] = (dR @ R_cw).astype(np.float32)
        m.kf_pose_cw[kf, :, 3] = (t_cw + rng.normal(0, 0.05, 3)
                                  ).astype(np.float32)
        true_poses.append((R_cw, t_cw))
        if prev is not None:
            m.kf_prev[kf] = prev
            m.kf_next[prev] = kf
        prev = kf

    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       use_lines=False)
    atlas = Atlas(maps=[m], active=0)
    voc = V.random_vocabulary(seed=0)
    kfdb = KeyFrameDatabase(voc, m.max_kf, n_feat)
    lc = LoopCloser(cfg, atlas, kfdb, n_feat, pg_kf_cap=64, pg_edge_cap=128)
    # force the chained path: cap far below the 48-KF chain
    lc._gba_caps = (16, 4096, 8192)

    chain = m.kf_chain()
    before = m.kf_pose_cw[chain].copy()
    lc.run_global_ba(fixed_kf=int(chain[0]))

    moved = np.linalg.norm(
        (m.kf_pose_cw[chain] - before).reshape(len(chain), -1), axis=1)
    # every non-anchor KF moved (no truncation), including the oldest
    assert (moved[1:] > 1e-5).all(), moved
    # and moved TOWARD truth: mean pose error shrinks substantially
    def err(poses):
        e = 0.0
        for k, (R_t, t_t) in zip(chain, true_poses):
            e += np.linalg.norm(poses[k, :, 3] - t_t)
        return e / len(chain)
    e_before = 0.0
    for i, (R_t, t_t) in enumerate(true_poses):
        e_before += np.linalg.norm(before[i, :, 3] - t_t)
    e_before /= len(chain)
    e_after = err(m.kf_pose_cw)
    # block-Schwarz with frozen halos converges a modest amount per
    # sweep; the essential property is COVERAGE (no truncation) plus
    # monotone improvement — the pose graph carries the bulk of a real
    # loop correction before GBA refines
    assert e_after < 0.85 * e_before, (e_before, e_after)


def test_sim3_guided_refinement_grows_inliers(rng):
    """Guided Sim3 refinement (reference SearchBySim3 src/ORBmatcher.cc:
    1962 + OptimizeSim3 src/Optimizer.cc:8462 iterated before accepting
    a loop): starting from a coarse similarity, the 3D-gated descriptor
    re-matching + Horn refit must grow the correspondence set and tighten
    the transform."""
    from plvio_tpu.config import SystemConfig, CameraConfig
    from plvio_tpu.models.mapstore import Atlas, MapStore
    from plvio_tpu.models.kfdb import KeyFrameDatabase
    from plvio_tpu.models.loop_closing import LoopCloser
    from plvio_tpu.models import vocabulary as V
    from plvio_tpu.ops import matching as M

    n_feat, n_pts = 128, 600
    pts = rng.uniform(-3, 3, (n_pts, 3)).astype(np.float32)
    descs = rng.choice([-1.0, 1.0], (n_pts, 256)).astype(np.float32)
    packed = np.asarray(M.pack_bits_u32(jnp.asarray(descs, jnp.bfloat16)))

    # true similarity current -> old
    s_t = 1.15
    phi = np.array([0.03, -0.02, 0.3], np.float32)
    R_t = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    t_t = np.array([0.4, -0.2, 0.15], np.float32)

    def mk(store_pts):
        mm = MapStore(max_kf=8, max_pts=2048, max_lines=8, n_feat=n_feat)
        ids = mm.alloc_points(n_pts)
        mm.pt_xyz[ids] = store_pts
        mm.pt_desc[ids] = packed
        mm.pt_n_obs[ids] = 3
        kf = mm.alloc_kf()
        mm.kf_feat_valid[kf, :n_feat] = True
        mm.kf_match_pt[kf, :n_feat] = ids[:n_feat]
        return mm, kf
    m_old, kf_old = mk((s_t * pts @ R_t.T + t_t
                        + rng.normal(0, 0.01, (n_pts, 3))).astype(np.float32))
    m_cur, kf_cur = mk(pts)

    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       use_lines=False)
    atlas = Atlas(maps=[m_cur], active=0)
    voc = V.random_vocabulary(seed=0)
    kfdb = KeyFrameDatabase(voc, 8, n_feat)
    lc = LoopCloser(cfg, atlas, kfdb, n_feat, pg_kf_cap=8, pg_edge_cap=16)

    # coarse start: true sim3 perturbed enough that only nearby points
    # fall inside the first 3D gate
    s0 = s_t * 1.06
    R0 = np.asarray(lie.so3_exp(jnp.asarray(
        phi + np.array([0.02, 0.01, -0.03], np.float32))))
    t0 = t_t + np.array([0.15, -0.1, 0.1], np.float32)
    s1, R1, t1, n1 = lc._refine_sim3_guided(
        kf_cur, kf_old, m_old, float(s0), R0, t0, fix_scale=False)
    assert n1 >= 100, f"refinement kept only {n1} correspondences"
    # the refined similarity is much closer to truth than the start
    err_t0 = np.linalg.norm(t0 - t_t)
    err_t1 = np.linalg.norm(t1 - t_t)
    assert err_t1 < 0.25 * err_t0, (err_t0, err_t1)
    assert abs(s1 - s_t) < 0.25 * abs(s0 - s_t)
