"""Live HTTP viewer (the Pangolin Viewer thread analog, Viewer.cc:66-152):
dashboard page, map rendering, JSON state, localization-mode toggle."""

import json
import urllib.request

import numpy as np

from orbslamm_tpu.io.synthetic import make_sequence
from orbslamm_tpu.io.viewer import LiveViewer
from orbslamm_tpu.models.multimap import MultiMapper
from orbslamm_tpu.models.system import TrackingState
from orbslamm_tpu.utils.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig, TrackingConfig,
)


def test_live_viewer_serves_state_and_map():
    cam = CameraConfig(width=320, height=240, fx=260, fy=260, cx=160, cy=120,
                       fps=30)
    cfg = SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=400, max_keypoints=1024, n_levels=4),
        capacity=CapacityConfig(max_keyframes=64, max_landmarks=4096),
        tracking=TrackingConfig(
            pixel_noise=1.2, min_matches_init=55, init_min_triangulated=30,
            init_min_parallax_deg=0.4,
        ),
    )
    seq = make_sequence(n_frames=16, n_points=900, cam=cam, seed=7,
                        motion="forward")
    mm = MultiMapper(cfg)
    mm.add_robot("r0")
    for i in range(16):
        mm.process_frame(0, seq.images[i], float(seq.timestamps[i]))
    assert mm.robots[0].state == TrackingState.OK

    viewer = LiveViewer(mm, port=0)  # port 0: ephemeral
    viewer.start()
    try:
        port = viewer._httpd.server_address[1]
        base = f"http://127.0.0.1:{port}"
        state = json.loads(urllib.request.urlopen(f"{base}/state").read())
        assert state["robots"][0]["state"] == "OK"
        assert state["maps"][0]["n_kf"] >= 2
        png = urllib.request.urlopen(f"{base}/map.png").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        page = urllib.request.urlopen(f"{base}/").read()
        assert b"orbslamm_tpu" in page
        # runtime toggle (ActivateLocalizationMode analog)
        req = urllib.request.Request(f"{base}/localization/on", method="POST")
        assert urllib.request.urlopen(req).status == 200
        assert mm.robots[0].localization_only
        req = urllib.request.Request(f"{base}/localization/off", method="POST")
        urllib.request.urlopen(req)
        assert not mm.robots[0].localization_only
    finally:
        viewer.stop()
