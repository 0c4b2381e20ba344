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
"""
from __future__ import annotations

import json
from typing import Optional

import numpy as np


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
