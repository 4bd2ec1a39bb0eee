"""HTTP serving front-end (din_tpu/experiments/serve_http.py): stdlib
endpoint around Predictor — healthz, npz predict round-trip equal to the
direct call, malformed-request 400s.  The reference has no serving layer
at all (SURVEY.md §5)."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np

from __graft_entry__ import _flagship_cfg, _make_batch
from din_tpu.experiments.predict import Predictor
from din_tpu.experiments.serve_http import make_server


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_http_predict_roundtrip():
    cfg = _flagship_cfg(tiny=True).replace(batch_size=2)
    pred = Predictor.from_checkpoint(cfg, None, pad_to=2)
    srv = make_server(pred, info={"model": cfg.inference_module_name,
                                  "pad_to": pred.pad_to})
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["pad_to"] == 2

        batch = _make_batch(cfg, batch_size=3)     # ragged vs pad_to=2
        buf = io.BytesIO()
        np.savez(buf, images=batch["images"], boxes=batch["boxes"])
        got = _post(base + "/predict", buf.getvalue())
        ref = pred(batch["images"], batch["boxes"])
        np.testing.assert_allclose(np.asarray(got["activities"]),
                                   ref["activities"], rtol=1e-5, atol=1e-6)

        # malformed body and missing keys -> 400 with an error message
        for bad in (b"not an npz",):
            try:
                _post(base + "/predict", bad)
                raise AssertionError("expected HTTP 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "error" in json.loads(e.read())
        buf = io.BytesIO()
        np.savez(buf, images=batch["images"])      # boxes missing
        try:
            _post(base + "/predict", buf.getvalue())
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "boxes" in json.loads(e.read())["error"]

        # unknown path -> 404
        try:
            urllib.request.urlopen(base + "/nope", timeout=30)
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=30)
