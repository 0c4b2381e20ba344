"""Atlas map merge: after tracking loss the tracker starts a fresh map
(elastic recovery); when it revisits known territory, loop closing must
detect the overlap in the OTHER map, estimate the inter-map Sim3 and
absorb the young map into the old one (reference
LoopClosing::MergeLocal, src/LoopClosing.cc:2448; NewDetectCommonRegions
merge branch :94-133)."""
import numpy as np
import jax.numpy as jnp

from plvio_tpu.config import SystemConfig, CameraConfig
from plvio_tpu.models.mapstore import Atlas, MapStore
from plvio_tpu.models.kfdb import AtlasKeyFrameDatabase
from plvio_tpu.models.loop_closing import LoopCloser
from plvio_tpu.models import vocabulary as V
from plvio_tpu.ops import matching as M

FX, FY, CX, CY = 458.654, 457.296, 367.215, 248.375
N_FEAT = 256


def _world(rng, n_pts=1500):
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    pts = np.stack([3.0 * np.cos(ang), 3.0 * np.sin(ang),
                    rng.uniform(-1.5, 1.5, n_pts)], -1).astype(np.float32)
    descs = rng.choice([-1.0, 1.0], (n_pts, 256)).astype(np.float32)
    packed = np.asarray(M.pack_bits_u32(jnp.asarray(descs, jnp.bfloat16)))
    return pts, packed


def _pose_on_circle(a):
    c, s = np.cos(a), np.sin(a)
    p = np.array([1.2 * c, 1.2 * s, 0.0])
    look = np.array([c, s, 0.0])
    x = np.cross([0, 0, -1.0], look)
    x /= np.linalg.norm(x)
    y = np.cross(look, x)
    R_wc = np.stack([x, y, look], -1)
    R_cw = R_wc.T
    return R_cw.astype(np.float32), (-R_cw @ p).astype(np.float32), p


def _add_kf(m, pts_w, packed, R_cw, t_cw, timestamp, pt_ids, prev_kf):
    kf = m.alloc_kf()
    m.kf_timestamp[kf] = timestamp
    m.kf_pose_cw[kf] = np.concatenate([R_cw, t_cw[:, None]], 1)
    pc = pts_w @ R_cw.T + t_cw
    z = pc[:, 2]
    uv = np.stack([FX * pc[:, 0] / np.maximum(z, 1e-6) + CX,
                   FY * pc[:, 1] / np.maximum(z, 1e-6) + CY], -1)
    vis = (z > 0.3) & (uv[:, 0] > 10) & (uv[:, 0] < 742) \
        & (uv[:, 1] > 10) & (uv[:, 1] < 470)
    sel = np.nonzero(vis)[0][:N_FEAT]
    m.kf_feat_uv[kf, :len(sel)] = uv[sel]
    m.kf_feat_desc[kf, :len(sel)] = packed[sel]
    m.kf_feat_valid[kf, :len(sel)] = True
    m.kf_match_pt[kf, :len(sel)] = pt_ids[sel]
    if prev_kf is not None:
        m.kf_prev[kf] = prev_kf
        m.kf_next[prev_kf] = kf
    return kf


def test_cross_map_merge(rng):
    pts_w, packed = _world(rng)

    # --- old map: the full circle, in the true world frame -------------
    m_old = MapStore(max_kf=64, max_pts=8192, max_lines=64, n_feat=N_FEAT)
    ids_old = m_old.alloc_points(len(pts_w))
    m_old.pt_xyz[ids_old] = pts_w
    m_old.pt_desc[ids_old] = packed
    m_old.pt_n_obs[ids_old] = 2
    prev = None
    old_kfs = []
    for i, a in enumerate(np.linspace(0, 2 * np.pi, 14, endpoint=False)):
        R_cw, t_cw, _ = _pose_on_circle(a)
        prev = _add_kf(m_old, pts_w, packed, R_cw, t_cw, 0.5 * i,
                       ids_old, prev)
        old_kfs.append(prev)
    for kf in old_kfs:
        m_old.update_covisibility(kf)

    # --- current map: a revisit near angle 0, in a DIFFERENT frame -----
    # world-cur related to world-old by X_old = s0 R0 X_cur + t0
    s0 = 1.3
    th = 0.3
    R0 = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0],
                   [0, 0, 1.0]], np.float32)
    t0 = np.array([0.5, -0.2, 0.1], np.float32)
    pts_cur = ((pts_w - t0) @ R0) / s0   # R0^T (X_old - t0) / s0

    m_cur = MapStore(max_kf=64, max_pts=8192, max_lines=64,
                     n_feat=N_FEAT, map_id=1)
    # only the points visible from the revisit neighborhood get into the
    # young map (it is small), with the same descriptors
    ids_cur = m_cur.alloc_points(len(pts_cur))
    m_cur.pt_xyz[ids_cur] = pts_cur.astype(np.float32)
    m_cur.pt_desc[ids_cur] = packed
    m_cur.pt_n_obs[ids_cur] = 2
    prev = None
    cur_kfs = []
    true_centers = []
    for i, a in enumerate([0.0, 0.12, 0.24, 0.36, 0.48]):
        R_cw_w, t_cw_w, p_true = _pose_on_circle(a)
        # camera pose in the cur frame: T_c<-cur = T_c<-old * S0
        R_cw = R_cw_w @ R0
        t_cw = (R_cw_w @ t0 + t_cw_w) * (1.0 / 1.0)  # rotation part
        # under X_old = s0 R0 X_cur + t0: pc = R_cw_w(s0 R0 Xc + t0)+t_cw_w
        # = s0 [R_cw_w R0] Xc + (R_cw_w t0 + t_cw_w): projectively equal to
        # T = [R_cw_w R0 | (R_cw_w t0 + t_cw_w)/s0]
        t_cw = (R_cw_w @ t0 + t_cw_w) / s0
        prev = _add_kf(m_cur, pts_cur, packed, R_cw.astype(np.float32),
                       t_cw.astype(np.float32), 100.0 + 0.5 * i,
                       ids_cur, prev)
        cur_kfs.append(prev)
        true_centers.append(p_true)
    for kf in cur_kfs:
        m_cur.update_covisibility(kf)

    atlas = Atlas(maps=[m_old, m_cur], active=1)
    voc = V.random_vocabulary(seed=0)
    kfdb = AtlasKeyFrameDatabase(voc, 64, N_FEAT, atlas)
    for kf in old_kfs:
        kfdb.add_keyframe(kf, m_old.kf_feat_desc[kf],
                          m_old.kf_feat_valid[kf], map_id=0)
    for kf in cur_kfs:
        kfdb.add_keyframe(kf, m_cur.kf_feat_desc[kf],
                          m_cur.kf_feat_valid[kf], map_id=1)

    cfg = SystemConfig(camera=CameraConfig(dist=(0., 0., 0., 0.)),
                       use_lines=False)
    lc = LoopCloser(cfg, atlas, kfdb, N_FEAT, pg_kf_cap=64, pg_edge_cap=256,
                    gba_obs_cap=8192)
    lc._gba_caps = (64, 8192, 8192)

    merged = False
    for kf in cur_kfs[-3:]:
        merged = lc.process_keyframe(kf) or merged
    assert merged, "cross-map overlap was not detected/merged"
    assert len(atlas.maps) == 1 and atlas.current is m_old
    assert lc.pending_merge is not None
    kf_map = lc.pending_merge["kf_map"]

    # merged KFs must land near their true world positions
    for kf, p_true in zip(cur_kfs, true_centers):
        k2 = kf_map[kf]
        assert k2 >= 0 and m_old.kf_valid[k2]
        R = m_old.kf_pose_cw[k2, :, :3]
        t = m_old.kf_pose_cw[k2, :, 3]
        err = np.linalg.norm(-R.T @ t - p_true)
        assert err < 0.08, err

    # the weld must have fused duplicated landmarks
    assert lc.n_maps_merged == 1
    n_total = int(m_old.pt_valid.sum())
    assert n_total < 2 * len(pts_w), n_total

    # merged KFDB rows answer queries in the surviving map
    cands, _ = kfdb.query(m_old.kf_feat_desc[kf_map[cur_kfs[0]]],
                          m_old.kf_feat_valid[kf_map[cur_kfs[0]]],
                          top_n=3, map_id=0)
    assert len(cands) > 0
