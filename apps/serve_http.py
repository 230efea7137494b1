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
        [--warmup 1,32] [--full] [--microbatch 32 --window_ms 3]

--microbatch N coalesces concurrent requests into one device dispatch
of up to N images (MicroBatcher below): under concurrent small-batch
load the device runs one batched program instead of a queue of batch-1
launches. The warmed sizes double as padding buckets so ragged
micro-batches hit pre-compiled programs.
"""

import argparse
import io
import json
import os
import queue
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


class MicroBatcher:
    """Coalesce concurrent /infer requests into one device dispatch.

    The single-flight path serializes requests behind the device lock —
    under concurrent b=1 load every request pays a full program launch
    and the MXU runs at batch-1 utilization. This dispatcher queues
    requests, waits up to ``window_ms`` after the first arrival (or
    until ``max_batch`` images are pending), concatenates them along the
    batch axis, runs ONE inference, and slices the outputs back per
    request. Correct because the network is batch-parallel in eval mode
    (BN uses running stats; attention is over each sample's own 42
    joint tokens — no cross-batch mixing).

    ``buckets``: sorted batch sizes to zero-pad a coalesced batch up to
    (pad rows sliced away before responding). A symbolic-batch artifact
    compiles per distinct size — padding to the warmed sizes keeps the
    compile count bounded under ragged traffic.
    """

    def __init__(self, infer, lock, stats, full: bool, max_batch: int,
                 window_ms: float, buckets=()):
        self.infer = infer
        self.lock = lock
        self.stats = stats
        self.full = full
        self.max_batch = max_batch
        self.window_s = window_ms / 1e3
        self.buckets = tuple(sorted(b for b in buckets if b > 0))
        self.q = queue.SimpleQueue()
        # _stop_lock orders submit() against stop(): the stopped flag is
        # set under the same lock that guards q.put, so no request can
        # land behind the shutdown sentinel (whose slot event would
        # never be set — a permanently hung handler thread).
        self._stop_lock = threading.Lock()
        self._stopped = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        with self._stop_lock:
            self._stopped = True
            self.q.put(None)
        self._thread.join(timeout=10)

    def submit(self, img: np.ndarray) -> dict:
        slot = {"event": threading.Event(), "out": None, "err": None}
        with self._stop_lock:
            if self._stopped:
                raise RuntimeError("MicroBatcher is stopped")
            self.q.put((img, slot))
        slot["event"].wait()
        if slot["err"] is not None:
            raise slot["err"]
        return slot["out"]

    def _collect(self):
        """Block for the first request, then gather more until the
        window closes or max_batch images are pending. Returns the
        group, or None on the shutdown sentinel."""
        first = self.q.get()
        if first is None:
            return None
        group = [first]
        total = first[0].shape[0]
        deadline = time.monotonic() + self.window_s
        while total < self.max_batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                nxt = self.q.get(timeout=left)
            except queue.Empty:
                break
            if nxt is None:
                self.q.put(None)  # re-post for the next _collect
                break
            group.append(nxt)
            total += nxt[0].shape[0]
        return group

    def _dispatch_single(self, img: np.ndarray) -> dict:
        # Pad to a warmed bucket just like the group path: on a
        # symbolic-batch artifact a raw-size dispatch would compile a
        # fresh program per distinct size (minutes through the tunnel)
        # while the batcher thread — and every queued request — waits.
        n_real = int(img.shape[0])
        pad_to = next((b for b in self.buckets if b >= n_real), n_real)
        if pad_to > n_real:
            img = np.concatenate(
                [img, np.zeros((pad_to - n_real,) + img.shape[1:],
                               img.dtype)])
        with self.lock:
            out = self.infer(img)
            resp = {k: np.asarray(v)[:n_real] for k, v in
                    _final_outputs(out, self.full).items()}
            self.stats["dispatches"] += 1
            self.stats["images"] += n_real
        return resp

    def _loop(self):
        while True:
            group = self._collect()
            if group is None:
                return
            # The whole coalesce+dispatch runs under try: the handler
            # validates only (B, H, W, 3), so mixed-resolution groups
            # fail at np.concatenate — an uncaught exception here kills
            # the batcher thread and hangs every future request.
            try:
                batch = (np.concatenate([g[0] for g in group])
                         if len(group) > 1 else group[0][0])
                n_real = batch.shape[0]
                pad_to = next((b for b in self.buckets if b >= n_real),
                              n_real)
                if pad_to > n_real:
                    batch = np.concatenate(
                        [batch,
                         np.zeros((pad_to - n_real,) + batch.shape[1:],
                                  batch.dtype)])
                with self.lock:
                    out = self.infer(batch)
                    resp = {k: np.asarray(v) for k, v in
                            _final_outputs(out, self.full).items()}
                    self.stats["dispatches"] += 1
                    self.stats["images"] += n_real
            except Exception:  # noqa: BLE001 — isolate the bad request
                # Group dispatch failed (shape mismatch, device error):
                # retry each request alone so one malformed request
                # doesn't poison its neighbors — only IT gets the 400.
                for img, slot in group:
                    try:
                        slot["out"] = self._dispatch_single(img)
                    except Exception as e:  # noqa: BLE001 — per-request
                        slot["err"] = e
                    slot["event"].set()
                continue
            ofs = 0
            for img, slot in group:
                n = img.shape[0]
                slot["out"] = {k: v[ofs:ofs + n] for k, v in resp.items()}
                ofs += n
                slot["event"].set()


def make_handler(infer, lock, stats, full: bool, batcher=None):
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
                s["avg_batch"] = (
                    round(s["images"] / s["dispatches"], 2)
                    if s["dispatches"] else None)
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
                if batcher is not None:
                    resp = batcher.submit(img.astype(np.float32))
                    with lock:
                        stats["requests"] += 1
                        stats["lat_sum"] += time.perf_counter() - t0
                else:
                    with lock:  # ONE device client; serialize dispatch
                        out = infer(img.astype(np.float32))
                        resp = {k: np.asarray(v) for k, v in
                                _final_outputs(out, full).items()}
                        stats["requests"] += 1
                        stats["dispatches"] += 1
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
                full: bool = False, max_batch: int = 0,
                window_ms: float = 3.0, buckets=()):
    """Build (but don't start) the server — also the test entry point.

    ``max_batch > 0`` enables request micro-batching (see MicroBatcher);
    0 keeps the single-flight path."""
    from dir_tpu import serve

    infer = serve.load(artifact)
    lock = threading.Lock()
    stats = {"requests": 0, "images": 0, "dispatches": 0, "lat_sum": 0.0}
    batcher = (MicroBatcher(infer, lock, stats, full, max_batch,
                            window_ms, buckets)
               if max_batch > 0 else None)
    srv = ThreadingHTTPServer(
        (host, port), make_handler(infer, lock, stats, full, batcher))
    srv.infer = infer  # exposed for warmup (same jit cache)
    srv.batcher = batcher
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
    ap.add_argument("--microbatch", type=int, default=0,
                    help="coalesce concurrent requests into one device "
                         "dispatch of up to this many images (0 = off)")
    ap.add_argument("--window_ms", type=float, default=3.0,
                    help="how long a micro-batch waits for more "
                         "requests after the first arrives")
    opt = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from dir_tpu.utils.logger import setup_logger
    logger = setup_logger(name="dir_tpu.serve")

    warm = ([int(x) for x in opt.warmup.split(",")] if opt.warmup else [])
    # warmed sizes double as the padding buckets: micro-batches pad up
    # to a pre-compiled size instead of compiling per ragged size
    srv = make_server(opt.artifact, opt.host, opt.port, opt.full,
                      max_batch=opt.microbatch, window_ms=opt.window_ms,
                      buckets=warm)
    if opt.warmup:
        for b in warm:
            t0 = time.perf_counter()
            jax.block_until_ready(
                srv.infer(np.zeros((b, 256, 256, 3), np.float32)))
            logger.info("warmed batch %d in %.1f s", b,
                        time.perf_counter() - t0)
    logger.info("serving %s on %s:%d", opt.artifact, opt.host, opt.port)
    srv.serve_forever()


if __name__ == "__main__":
    main()
