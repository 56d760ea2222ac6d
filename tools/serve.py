#!/usr/bin/env python
"""Serve an exported sampler artifact over HTTP (the deployment endpoint).

    # export once (tools/export.py), then serve it:
    python tools/serve.py sampler.jaxexport [--port 8787] [--host 127.0.0.1]

    # one-process latency/throughput bench through the full HTTP stack:
    python tools/serve.py sampler.jaxexport --bench 20

Endpoints:
    GET  /healthz          -> {"ok": true, "model": ..., "out_shape": ...}
    GET  /stats            -> request count + latency percentiles (ms)
    POST /sample           -> body {"seed": int, "format": "npy"|"png"}
                              npy: raw np.save bytes of the sample batch
                              png: rendered sample grid

The reference has no deployment path at all (sampling only ever runs
inside a Lightning validation callback, `src/callbacks/visualization.py`
— see tools/export.py).  Design notes, TPU-first:

- the artifact is a `jax.export` StableHLO module with params baked in:
  the server imports NO model code and composes NO config — deserialization
  + one warmup call and it is hot;
- one chip, one compiled program: requests serialize through a lock and
  each dispatches the whole fixed-batch sampler (batch size is baked at
  export; clients wanting fewer samples slice).  The lock is the honest
  single-chip scheduler — concurrency belongs to the mesh, not the host;
- latency stats are measured around the device call (fenced by the
  np.asarray device_get), so p50/p95 reflect real sampler dispatch.
"""
from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


class SamplerService:
    """Deserialized artifact + warmup + fenced timing."""

    def __init__(self, artifact: str):
        import jax
        from jax import export as jexport

        self.path = str(artifact)
        self.exported = jexport.deserialize(Path(artifact).read_bytes())
        meta_path = Path(str(artifact) + ".json")
        self.meta = (json.loads(meta_path.read_text())
                     if meta_path.exists() else {})
        self._jax = jax
        self._lock = threading.Lock()
        self.latencies_ms: list = []
        # warmup: first call compiles for this backend
        self.sample(seed=0)
        self.latencies_ms.clear()

    def sample(self, seed: int):
        import numpy as np
        key = self._jax.random.PRNGKey(int(seed))
        with self._lock:
            t0 = time.perf_counter()
            out = np.asarray(self.exported.call(key))  # device_get fence
            self.latencies_ms.append((time.perf_counter() - t0) * 1e3)
        return out

    def stats(self) -> dict:
        import numpy as np
        lat = sorted(self.latencies_ms)
        pct = (lambda p: round(float(np.percentile(lat, p)), 2)) if lat \
            else (lambda p: None)
        n = len(lat)
        batch = self.meta.get("n")
        return {"requests": n, "p50_ms": pct(50), "p95_ms": pct(95),
                "p99_ms": pct(99),
                "batch_per_request": batch,
                "samples_per_sec": (round(batch * n / (sum(lat) / 1e3), 1)
                                    if lat and batch else None)}


def make_handler(svc: SamplerService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "artifact": svc.path,
                                 **{k: svc.meta.get(k) for k in
                                    ("model", "n", "out_shape", "platforms")}})
            elif self.path == "/stats":
                self._json(200, svc.stats())
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/sample":
                self._json(404, {"error": f"no route {self.path}"})
                return
            try:
                ln = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(ln) or b"{}")
                seed = int(req.get("seed", 0))
                fmt = req.get("format", "npy")
                imgs = svc.sample(seed)
                if fmt == "png":
                    from igm_tpu.callbacks.visualization import make_grid
                    from PIL import Image
                    import numpy as np
                    grid = np.asarray(make_grid(imgs, normalize=True))
                    if grid.shape[-1] == 1:
                        grid = grid[..., 0]
                    if grid.dtype != np.uint8:
                        grid = (np.clip(grid, 0.0, 1.0) * 255).astype(
                            np.uint8)
                    buf = io.BytesIO()
                    Image.fromarray(grid).save(buf, "PNG")
                    self._send(200, buf.getvalue(), "image/png")
                else:
                    import numpy as np
                    buf = io.BytesIO()
                    np.save(buf, imgs)
                    self._send(200, buf.getvalue(), "application/x-npy")
            except Exception as exc:  # surface the error to the client
                self._json(500, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


def serve(artifact: str, host: str, port: int) -> ThreadingHTTPServer:
    svc = SamplerService(artifact)
    httpd = ThreadingHTTPServer((host, port), make_handler(svc))
    httpd.service = svc
    return httpd


def bench(artifact: str, n_requests: int) -> dict:
    """Latency through the full HTTP stack (server in-process)."""
    import urllib.request

    httpd = serve(artifact, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        t0 = time.perf_counter()
        for i in range(n_requests):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/sample",
                data=json.dumps({"seed": i}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                assert r.status == 200
                r.read()
        wall = time.perf_counter() - t0
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats") as r:
            stats = json.loads(r.read())
        stats["wall_s"] = round(wall, 3)
        stats["http_requests_per_sec"] = round(n_requests / wall, 2)
        return stats
    finally:
        httpd.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--bench", type=int, default=0,
                    help="run N requests through the HTTP stack and print "
                         "one JSON stats line instead of serving")
    args = ap.parse_args()

    from igm_tpu.utils.platform import apply_platform_env
    apply_platform_env()

    if args.bench:
        print(json.dumps(bench(args.artifact, args.bench)))
        return
    httpd = serve(args.artifact, args.host, args.port)
    print(f"serving {args.artifact} on http://{args.host}:"
          f"{httpd.server_address[1]}  (POST /sample, GET /healthz /stats)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
