"""Minimal production-style HTTP front-end around ``Predictor``.

The reference framework has no serving story at all (its drivers only
train and eval, train_net.py:28-137); this exceeds parity: a
dependency-free (stdlib http.server) endpoint that answers clip
requests from the one compiled fixed-shape program.

Protocol
  GET  /healthz   -> 200 {"ok": true, "model": ..., "pad_to": ...}
  POST /predict   -> body = .npz with arrays
                       images      uint8 [B,T,H,W,3]
                       boxes       f32   [B,T,N,4]  (feature-map coords)
                       bboxes_num  i32   [B,T]      (collective only)
                     response = JSON {"activities": [[...]], "actions"?: ...}
                     (softmax posteriors, batch-major lists)

Run:
  python -m din_tpu.experiments.serve_http --preset volleyball_stage2_dynamic \
      --ckpt result/<exp>/stage2_*.ckpt --port 8787 --pad-to 4

Client (stdlib only):
  buf = io.BytesIO(); np.savez(buf, images=images, boxes=boxes)
  urllib.request.urlopen("http://host:8787/predict", data=buf.getvalue())
"""

from __future__ import annotations

import argparse
import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _Handler(BaseHTTPRequestHandler):
    predictor = None          # set on the server class by make_server
    info = {}

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):          # quiet by default
        pass

    def do_GET(self):
        if self.path == "/healthz":
            return self._send(200, {"ok": True, **self.info})
        return self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path != "/predict":
            return self._send(404, {"error": f"unknown path {self.path}"})
        try:
            n = int(self.headers.get("Content-Length", "0"))
            arrs = np.load(io.BytesIO(self.rfile.read(n)))
            if "images" not in arrs or "boxes" not in arrs:
                raise ValueError("request .npz needs 'images' and 'boxes'")
            out = self.predictor(
                arrs["images"], arrs["boxes"],
                arrs["bboxes_num"] if "bboxes_num" in arrs else None)
        except Exception as e:                      # noqa: BLE001
            return self._send(400, {"error": str(e)})
        return self._send(200, {k: np.asarray(v).tolist()
                                for k, v in out.items()})


def make_server(predictor, host: str = "127.0.0.1", port: int = 0,
                info: dict | None = None) -> ThreadingHTTPServer:
    """Bind a threaded HTTP server around `predictor` (port 0 = ephemeral;
    the bound port is ``server.server_address[1]``).  Caller runs
    ``server.serve_forever()`` (or a thread around it) and
    ``server.shutdown()``."""
    handler = type("Handler", (_Handler,),
                   {"predictor": staticmethod(predictor), "info": info or {}})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    from din_tpu.experiments.predict import Predictor
    from din_tpu.experiments.presets import PRESETS

    p = argparse.ArgumentParser(description="din_tpu HTTP serving")
    p.add_argument("--preset", default="volleyball_stage2_dynamic")
    p.add_argument("--ckpt", default=None,
                   help="stage-2 .ckpt (random init if omitted)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--pad-to", type=int, default=4,
                   help="fixed serving batch (one compiled program)")
    args = p.parse_args(argv)

    cfg = PRESETS[args.preset]()
    predictor = Predictor.from_checkpoint(cfg, args.ckpt, pad_to=args.pad_to)
    srv = make_server(predictor, args.host, args.port,
                      info={"model": cfg.inference_module_name,
                            "pad_to": predictor.pad_to})
    print(f"serving {cfg.inference_module_name} on "
          f"http://{args.host}:{srv.server_address[1]}  (pad_to="
          f"{predictor.pad_to})", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
