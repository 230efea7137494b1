"""HTTP serving daemon for exported DIR artifacts.

Completes the deployment story (reference has none — apps/eval.py:87-138
rebuilds the whole research stack on the serving host): load the
StableHLO artifact produced by apps/export.py and serve it over plain
HTTP with zero model code, flax, or MANO assets on the host.

Protocol (stdlib-only on both ends):
    GET  /healthz          -> 200 "ok"
    GET  /stats            -> JSON {requests, images, avg_latency_ms}
    POST /infer            -> body: .npy of (B, 256, 256, 3) float32
                              (normalized image crops, NHWC);
                              response: .npz with the final refinement
                              stage's outputs: mesh_xyz_left/right
                              (B, 778, 3), joint_xyz_left/right
                              (B, 21, 3), offset (B, 3), plus seg/dense
                              (B, 32, 32, 3) when --full.

Client example:
    import io, urllib.request, numpy as np
    buf = io.BytesIO(); np.save(buf, imgs)
    r = urllib.request.urlopen("http://host:8000/infer", buf.getvalue())
    out = np.load(io.BytesIO(r.read()))
    verts_l = out["mesh_xyz_left"]

Device dispatch is serialized behind one lock (one XLA client); HTTP
I/O threads overlap with compute. Export with --batch 0 (symbolic) so
one artifact serves every request size, and pass --warmup with the
expected sizes to pay their compiles before traffic.

Usage:
    python apps/serve_http.py --artifact dir.stablehlo --port 8000 \
        [--warmup 1,32] [--full]
"""

import argparse
import io
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np  # noqa: E402

# Reject /infer bodies beyond this size before buffering them (batch
# 1024 of float32 256x256x3 is ~800 MB; anything larger is a mistake
# or abuse, not a workload this host can hold twice in memory).
MAX_BODY_BYTES = int(os.environ.get("SERVE_MAX_BODY", str(1 << 30)))


def _final_outputs(out: dict, full: bool) -> dict:
    f = out["stages"][-1]
    resp = {
        "mesh_xyz_left": f["pd_mesh_xyz_left"],
        "mesh_xyz_right": f["pd_mesh_xyz_right"],
        "joint_xyz_left": f["pd_joint_xyz_left"],
        "joint_xyz_right": f["pd_joint_xyz_right"],
        "offset": f["pd_offset"],
    }
    if full:
        resp["seg"] = out["seg"]
        resp["dense"] = out["dense"]
    return resp


def make_handler(infer, lock, stats, full: bool):
    class Handler(BaseHTTPRequestHandler):
        # quiet per-request stderr lines (stats endpoint replaces them)
        def log_message(self, fmt, *args):  # noqa: N802
            pass

        def _send(self, code, body, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/stats":
                with lock:
                    s = dict(stats)
                s["avg_latency_ms"] = (
                    round(1e3 * s.pop("lat_sum") / s["requests"], 2)
                    if s["requests"] else None)
                self._send(200, json.dumps(s).encode(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):  # noqa: N802
            if self.path != "/infer":
                self._send(404, b"not found", "text/plain")
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n > MAX_BODY_BYTES:
                    self._send(413, json.dumps(
                        {"error": f"body {n} B exceeds the "
                                  f"{MAX_BODY_BYTES} B limit"}).encode(),
                        "application/json")
                    return
                img = np.load(io.BytesIO(self.rfile.read(n)),
                              allow_pickle=False)
                if img.ndim != 4 or img.shape[-1] != 3:
                    raise ValueError(f"expected (B, H, W, 3), got "
                                     f"{img.shape}")
                t0 = time.perf_counter()
                with lock:  # ONE device client; serialize dispatch
                    out = infer(img.astype(np.float32))
                    resp = {k: np.asarray(v) for k, v in
                            _final_outputs(out, full).items()}
                    stats["requests"] += 1
                    stats["images"] += int(img.shape[0])
                    stats["lat_sum"] += time.perf_counter() - t0
                buf = io.BytesIO()
                np.savez(buf, **resp)
                self._send(200, buf.getvalue())
            except Exception as e:  # noqa: BLE001 — report to client
                self._send(400, json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}).encode(),
                    "application/json")

    return Handler


def make_server(artifact: str, host: str = "127.0.0.1", port: int = 8000,
                full: bool = False):
    """Build (but don't start) the server — also the test entry point."""
    from dir_tpu import serve

    infer = serve.load(artifact)
    lock = threading.Lock()
    stats = {"requests": 0, "images": 0, "lat_sum": 0.0}
    srv = ThreadingHTTPServer((host, port),
                              make_handler(infer, lock, stats, full))
    srv.infer = infer  # exposed for warmup (same jit cache)
    return srv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", type=str, required=True)
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--warmup", type=str, default="",
                    help="comma-separated batch sizes to compile before "
                         "accepting traffic (symbolic-batch artifacts "
                         "compile per size)")
    ap.add_argument("--full", action="store_true",
                    help="include seg/dense maps in responses")
    opt = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from dir_tpu.utils.logger import setup_logger
    logger = setup_logger(name="dir_tpu.serve")

    srv = make_server(opt.artifact, opt.host, opt.port, opt.full)
    if opt.warmup:
        for b in (int(x) for x in opt.warmup.split(",")):
            t0 = time.perf_counter()
            jax.block_until_ready(
                srv.infer(np.zeros((b, 256, 256, 3), np.float32)))
            logger.info("warmed batch %d in %.1f s", b,
                        time.perf_counter() - t0)
    logger.info("serving %s on %s:%d", opt.artifact, opt.host, opt.port)
    srv.serve_forever()


if __name__ == "__main__":
    main()
