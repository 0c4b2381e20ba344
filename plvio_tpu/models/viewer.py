"""Offline map/trajectory viewer exports.

Replaces the reference's live Pangolin GUI thread (reference:
src/Viewer.cc, src/FrameDrawer.cc, src/MapDrawer.cc — menu toggles,
camera-follow rendering, covisibility graph overlay) with offline
artifacts suited to headless TPU runs:

* export_ply       — colored point cloud + map lines + KF frusta +
                     trajectory polyline in one standard .ply any 3D
                     viewer opens;
* export_html      — a self-contained zero-dependency HTML viewer
                     (canvas, orbit controls) embedding the map as JSON;
* export_json      — raw map snapshot for external tooling.

DURING-RUN observability (the live-view analog — reference
Viewer::Run src/Viewer.cc:58-120 refreshes per frame; FrameDrawer
src/FrameDrawer.cc paints tracked features on the image):

* write_png        — dependency-free PNG writer (zlib from the stdlib);
* dump_overlay     — per-frame tracking overlay (features colored by
                     match state, matched lines, state-colored border),
                     enabled with PLVIO_OVERLAY_DIR [PLVIO_OVERLAY_EVERY];
* System exports an html/ply snapshot every PLVIO_SNAPSHOT_EVERY
  keyframes into PLVIO_SNAPSHOT_DIR.
"""
from __future__ import annotations

import json
import os
import struct
import zlib
from typing import Optional

import numpy as np


def write_png(path: str, rgb: np.ndarray) -> None:
    """Minimal PNG encoder (8-bit RGB) — zlib + struct only, no image
    library in the TPU container."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].astype(np.uint8).tobytes()
                   for y in range(h))

    def chunk(tag, data):
        out = struct.pack(">I", len(data)) + tag + data
        return out + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    hdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", hdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


_STATE_COLORS = {
    "OK": (40, 200, 60),
    "RECENTLY_LOST": (255, 160, 30),
    "LOST": (230, 40, 40),
    "NOT_INITIALIZED": (120, 120, 255),
    "NO_IMAGES_YET": (128, 128, 128),
}


def dump_overlay(img: np.ndarray, uv: np.ndarray, matched: np.ndarray,
                 state: str, frame_idx: int, out_dir: str,
                 line_ep: Optional[np.ndarray] = None,
                 line_matched: Optional[np.ndarray] = None) -> str:
    """Per-frame tracking overlay PNG (reference FrameDrawer::DrawFrame,
    src/FrameDrawer.cc: green = feature bound to a map point this frame,
    red = unmatched detection; matched line segments in cyan; 4-px
    border colored by tracking state)."""
    g = np.clip(np.asarray(img, np.float32), 0, 255).astype(np.uint8)
    if g.ndim == 3:
        g = g[..., 0]
    H, W = g.shape
    rgb = np.stack([g, g, g], -1).astype(np.int16)

    def dot(u, v, color, r=2):
        x0, x1 = max(0, u - r), min(W, u + r + 1)
        y0, y1 = max(0, v - r), min(H, v + r + 1)
        rgb[y0:y1, x0:x1] = color

    uv = np.asarray(uv)
    matched = np.asarray(matched)
    for i in range(len(uv)):
        u, v = int(round(float(uv[i, 0]))), int(round(float(uv[i, 1])))
        if not (0 <= u < W and 0 <= v < H):
            continue
        dot(u, v, (40, 220, 60) if matched[i] else (220, 50, 50),
            r=2 if matched[i] else 1)
    if line_ep is not None and line_matched is not None:
        for i in np.nonzero(np.asarray(line_matched))[0]:
            x0, y0, x1, y1 = np.asarray(line_ep[i], np.float32)
            npts = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
            xs = np.linspace(x0, x1, npts).round().astype(int)
            ys = np.linspace(y0, y1, npts).round().astype(int)
            ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
            rgb[ys[ok], xs[ok]] = (60, 200, 230)
    color = _STATE_COLORS.get(state, (128, 128, 128))
    rgb[:4] = color
    rgb[-4:] = color
    rgb[:, :4] = color
    rgb[:, -4:] = color
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"frame_{frame_idx:05d}_{state}.png")
    write_png(path, np.clip(rgb, 0, 255).astype(np.uint8))
    return path


def _map_snapshot(m, traj=None) -> dict:
    pts = m.pt_xyz[m.pt_valid].tolist()
    lines = m.ln_ep[m.ln_valid].tolist()
    kfs = m.valid_kf_indices()
    order = np.argsort(m.kf_timestamp[kfs])
    kfs = kfs[order]
    R = m.kf_pose_cw[kfs, :, :3]
    t = m.kf_pose_cw[kfs, :, 3]
    centers = -np.einsum("kji,kj->ki", R, t)
    covis_edges = []
    for i, k in enumerate(kfs):
        for other in np.nonzero(m.covis[k] >= 15)[0]:
            if other > k:
                covis_edges.append([int(k), int(other)])
    out = {
        "points": pts,
        "lines": lines,
        "kf_centers": centers.tolist(),
        "kf_ids": kfs.tolist(),
        "covis_edges": covis_edges,
    }
    if traj is not None:
        out["trajectory"] = np.asarray(traj.positions).tolist()
    return out


def export_json(m, path: str, traj=None) -> None:
    with open(path, "w") as f:
        json.dump(_map_snapshot(m, traj), f)


def export_ply(m, path: str, traj=None) -> None:
    """One .ply: map points (white), KF centers (green), trajectory
    samples (red), line endpoints connected by edges."""
    pts = m.pt_xyz[m.pt_valid]
    kfs = m.valid_kf_indices()
    R = m.kf_pose_cw[kfs, :, :3]
    t = m.kf_pose_cw[kfs, :, 3]
    centers = -np.einsum("kji,kj->ki", R, t)
    traj_pts = np.asarray(traj.positions) if traj is not None else np.zeros((0, 3))
    lines = m.ln_ep[m.ln_valid]
    line_verts = lines.reshape(-1, 3) if len(lines) else np.zeros((0, 3))

    verts = [(pts, (200, 200, 200)), (centers, (0, 255, 0)),
             (traj_pts, (255, 60, 60)), (line_verts, (80, 140, 255))]
    total = sum(len(v) for v, _ in verts)
    n_edges = len(lines)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {total}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element edge {n_edges}\n")
        f.write("property int vertex1\nproperty int vertex2\n")
        f.write("end_header\n")
        for v, (r, g, b) in verts:
            for p in v:
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {r} {g} {b}\n")
        base = len(pts) + len(centers) + len(traj_pts)
        for i in range(n_edges):
            f.write(f"{base + 2 * i} {base + 2 * i + 1}\n")


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>plvio_tpu map</title>
<style>body{margin:0;background:#111;color:#ddd;font-family:monospace}
canvas{display:block}#info{position:fixed;top:8px;left:8px}</style></head>
<body><div id="info"></div><canvas id="c"></canvas>
<script>
const DATA = __DATA__;
const cv = document.getElementById('c');
const ctx = cv.getContext('2d');
let yaw = 0.6, pitch = 0.4, dist = 8, cx = 0, cy = 0;
function resize(){cv.width=innerWidth;cv.height=innerHeight;}
addEventListener('resize', resize); resize();
let drag=false,lx=0,ly=0;
cv.onmousedown=e=>{drag=true;lx=e.x;ly=e.y};
addEventListener('mouseup',()=>drag=false);
addEventListener('mousemove',e=>{if(drag){yaw+=(e.x-lx)*0.01;pitch+=(e.y-ly)*0.01;lx=e.x;ly=e.y;draw();}});
addEventListener('wheel',e=>{dist*=Math.exp(e.deltaY*0.001);draw();});
function proj(p){
  const cya=Math.cos(yaw),sya=Math.sin(yaw),cpi=Math.cos(pitch),spi=Math.sin(pitch);
  let x=p[0]*cya-p[1]*sya, y=p[0]*sya+p[1]*cya, z=p[2];
  let y2=y*cpi-z*spi, z2=y*spi+z*cpi;
  const s=Math.min(cv.width,cv.height)/dist;
  return [cv.width/2+x*s, cv.height/2-z2*s];
}
function draw(){
  ctx.fillStyle='#111';ctx.fillRect(0,0,cv.width,cv.height);
  ctx.fillStyle='#bbb';
  for(const p of DATA.points){const q=proj(p);ctx.fillRect(q[0],q[1],1.4,1.4);}
  ctx.strokeStyle='#58f';ctx.lineWidth=1.2;
  for(const l of DATA.lines){const a=proj([l[0],l[1],l[2]]),b=proj([l[3],l[4],l[5]]);
    ctx.beginPath();ctx.moveTo(a[0],a[1]);ctx.lineTo(b[0],b[1]);ctx.stroke();}
  if(DATA.trajectory){ctx.strokeStyle='#f44';ctx.lineWidth=1.5;ctx.beginPath();
    DATA.trajectory.forEach((p,i)=>{const q=proj(p);i?ctx.lineTo(q[0],q[1]):ctx.moveTo(q[0],q[1]);});
    ctx.stroke();}
  ctx.fillStyle='#4f4';
  for(const p of DATA.kf_centers){const q=proj(p);ctx.fillRect(q[0]-2,q[1]-2,4,4);}
  document.getElementById('info').textContent =
    `points ${DATA.points.length}  lines ${DATA.lines.length}  kfs ${DATA.kf_centers.length}  (drag to orbit, wheel to zoom)`;
}
draw();
</script></body></html>
"""


def export_html(m, path: str, traj=None) -> None:
    html = _HTML_TEMPLATE.replace("__DATA__", json.dumps(_map_snapshot(m, traj)))
    with open(path, "w") as f:
        f.write(html)
