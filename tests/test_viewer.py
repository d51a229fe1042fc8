"""utils.viewer: HTTP surface + render-request handoff (no TPU)."""
import io
import json
import threading
import urllib.request

import numpy as np

from street_gaussians_ns_tpu.utils.viewer import RES_LADDER, ViewerServer


def _get(port, path):
    return urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=10)


def test_viewer_roundtrip():
    server = ViewerServer(port=0)   # ephemeral port
    try:
        c2w = np.eye(3, 4, dtype=np.float32)
        server.set_init(c2w, 0.25, extras={"frames": 3})
        server.update_stats(step=7, loss=0.5)

        # Static endpoints.
        assert b"viewer" in _get(server.port, "/").read()
        init = json.loads(_get(server.port, "/init").read())
        assert init["time"] == 0.25 and init["frames"] == 3
        assert len(init["c2w"]) == 12
        state = json.loads(_get(server.port, "/state").read())
        assert state["step"] == 7.0

        # Frame request: client blocks until the "train loop" services it.
        got = {}

        def client():
            q = ("/frame?c2w=" + ",".join(["1"] * 12) + "&time=0.5&res=low")
            got["jpeg"] = _get(server.port, q).read()

        th = threading.Thread(target=client)
        th.start()

        seen = {}

        def render_fn(c2w_req, t, w, h):
            seen["args"] = (c2w_req.shape, t, w, h)
            return np.full((h, w, 3), 128, np.uint8)

        # Poll service() as the trainer would between steps.
        for _ in range(500):
            if server.service(render_fn):
                break
            th.join(timeout=0.01)
        th.join(timeout=10)
        assert not th.is_alive()
        assert seen["args"] == ((3, 4), 0.5, *RES_LADDER["low"])
        assert got["jpeg"][:2] == b"\xff\xd8"   # JPEG magic

        from PIL import Image

        img = Image.open(io.BytesIO(got["jpeg"]))
        assert img.size == RES_LADDER["low"]

        # Bad params -> 400, no deadlock.
        try:
            _get(server.port, "/frame?c2w=bogus")
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.close()
