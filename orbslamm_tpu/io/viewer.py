"""Live viewer: a background HTTP server streaming the current map + frame.

The reference's Viewer is a Pangolin GL thread with runtime menu toggles
(Viewer.cc:66-152: Follow Camera / Show Points / Localization Mode /
Multi-Mapping). A TPU deployment is headless — the equivalent surface is a
tiny in-process HTTP server: it renders the live map (io/viz.draw_map) and
the latest frame overlay (viz.draw_frame) on demand and serves a
self-refreshing page, plus the same runtime toggles as POST endpoints.

Usage (drivers pass --viewer PORT):

    viewer = LiveViewer(mm, port=8642)
    viewer.start()             # daemon thread; serve_forever
    ... run the session ...
    viewer.stop()

Endpoints:
    GET  /          self-refreshing HTML dashboard
    GET  /map.png   current active-map rendering (rendered on request)
    GET  /state     JSON status (states, map sizes, merges — the
                    FrameDrawer HUD text analog)
    POST /localization/<on|off>   ActivateLocalizationMode analog
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>orbslamm_tpu</title>
<meta http-equiv="refresh" content="2">
<style>body{background:#111;color:#ddd;font-family:monospace}</style>
</head><body>
<h3>orbslamm_tpu live viewer</h3>
<pre id="s">%s</pre>
<img src="/map.png" style="max-width:90%%">
</body></html>"""


class LiveViewer:
    """Background HTTP dashboard over a MultiMapper (or any object with
    ``robots`` + ``live_maps()``)."""

    def __init__(self, mm, port: int = 8642, host: str = "127.0.0.1"):
        self.mm = mm
        self.port = port
        self.host = host
        self._httpd = None
        self._thread = None

    # -- renderings --------------------------------------------------------
    def _state_json(self) -> bytes:
        mm = self.mm
        out = {
            "robots": [
                {"name": t.name, "state": t.state.name,
                 "map_id": t.mapctx.map_id, "frames": len(t.frames)}
                for t in mm.robots
            ],
            "maps": [m.summary() for m in mm.live_maps()],
            "merges": list(mm.merges),
        }
        return json.dumps(out).encode()

    def _map_png(self) -> bytes:
        from tempfile import NamedTemporaryFile

        from orbslamm_tpu.io import viz

        mm = self.mm
        maps = mm.live_maps()
        if not maps:
            return b""
        # draw the biggest live map with every robot's trajectory on it
        mc = max(maps, key=lambda m: m.n_kf)
        traj = []
        for t in mm.robots:
            pts = [f.T_cw for f in t.frames
                   if f.state == "OK" and f.map_id == mc.map_id]
            if pts:
                traj.append(np.stack(pts))
        trajectory = np.concatenate(traj) if traj else None
        with NamedTemporaryFile(suffix=".png") as f:
            viz.draw_map(mc.map, f.name, trajectory=trajectory,
                         title=f"map {mc.map_id} (live)")
            f.seek(0)
            return f.read()

    # -- server ------------------------------------------------------------
    def start(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    if self.path == "/map.png":
                        self._send(200, "image/png", viewer._map_png())
                    elif self.path == "/state":
                        self._send(200, "application/json",
                                   viewer._state_json())
                    else:
                        body = (_PAGE % viewer._state_json().decode()).encode()
                        self._send(200, "text/html", body)
                except Exception as e:  # rendering races with the session
                    self._send(503, "text/plain", str(e).encode())

            def do_POST(self):
                if self.path.startswith("/localization/"):
                    on = self.path.endswith("/on")
                    for t in viewer.mm.robots:
                        t._sync_from_ts()
                        t.localization_only = on
                    self._send(200, "text/plain", b"ok")
                elif self.path.startswith("/multimapping/"):
                    # reference Viewer menu "Multi-Mapping" toggle →
                    # Tracking::InformMultiMapping (Viewer.cc:131-152)
                    on = self.path.endswith("/on")
                    viewer.mm.set_multi_mapping(on)
                    self._send(200, "text/plain", b"ok")
                else:
                    self._send(404, "text/plain", b"unknown")

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None
