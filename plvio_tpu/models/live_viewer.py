"""LIVE map viewer: an in-process HTTP server streaming map snapshots.

The reference runs a Pangolin GUI thread that re-renders the map every
frame (reference: src/Viewer.cc:58-120 Run loop, src/MapDrawer.cc) —
impossible headless.  The TPU-native equivalent is a zero-dependency
stdlib HTTP endpoint: the browser page polls `/map.json` once a second
and redraws the same canvas renderer the offline export embeds, so a
user watches the map/trajectory grow during a live run from any
machine that can reach the port.

Enable with `PLVIO_VIEWER_PORT=<port>` (System starts it automatically)
or `LiveViewer(system, port).start()`.  Endpoints:
  /          viewer page (auto-polling)
  /map.json  current atlas snapshot + tracking state
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from . import viewer as VW

_PAGE = VW._HTML_TEMPLATE.replace(
    "const DATA = __DATA__;",
    """let DATA = {points: [], lines: [], kf_centers: [], trajectory: []};
async function poll(){
  try {
    const r = await fetch('/map.json');
    DATA = await r.json();
    draw();
  } catch (e) {}
  setTimeout(poll, 1000);
}
setTimeout(poll, 0);""")


class LiveViewer:
    """Threaded HTTP server over a live System (daemon; never blocks
    tracking — snapshots are taken under the map lock, serving is not)."""

    def __init__(self, system, port: int = 8765):
        self.system = system
        self.port = port
        self._snapshot = {"points": [], "lines": [], "kf_centers": [],
                          "trajectory": [], "state": "NONE"}
        self._lock = threading.Lock()
        self._server = None
        self._threads = []

    # -- snapshotting ------------------------------------------------
    def refresh(self) -> None:
        """Take a fresh snapshot (called by System after each KF)."""
        sysm = self.system
        with sysm.map_lock:
            snap = VW._map_snapshot(sysm.atlas.current)
            try:
                import numpy as np
                traj = sysm.trajectory()
                snap["trajectory"] = \
                    np.asarray(traj.positions)[::2].tolist()
            except Exception:
                pass
            snap["state"] = sysm.state.name
            snap["n_maps"] = len(sysm.atlas.maps)
        with self._lock:
            self._snapshot = snap

    # -- server ------------------------------------------------------
    def start(self) -> None:
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):       # silent
                pass

            def do_GET(self):
                if self.path.startswith("/map.json"):
                    with viewer._lock:
                        body = json.dumps(viewer._snapshot).encode()
                    ctype = "application/json"
                else:
                    body = _PAGE.encode()
                    ctype = "text/html"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        self._threads.append(t)

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server = None
