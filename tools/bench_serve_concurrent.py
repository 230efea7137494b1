"""Serving under CONCURRENT load: single-flight vs micro-batched.

`tools/bench_serve_latency.py` times the bare device program per batch
size; this tool measures the HTTP daemon end-to-end the way a serving
deployment sees it: C concurrent clients each posting batch-1 images in
a closed loop. Two modes over the SAME loaded artifact (one jit cache,
so the A/B pays one compile set):

  single-flight  — every request is its own device dispatch behind the
                   client lock (the reference deployment model: one
                   image per forward, /root/reference/apps/eval.py
                   style but over HTTP)
  micro-batched  — MicroBatcher coalesces concurrent requests into one
                   dispatch of up to MB images, padding up to the
                   warmed bucket sizes (apps/serve_http.py --microbatch)

Prints per-request p50/p99 latency, aggregate img/s, and the realized
average dispatch batch. Knobs: CLIENTS, REQS (per client), MB
(max micro-batch), WINDOW_MS, BUCKETS.

Run queued on the TPU (bench holds /tmp/tpu_client.lock via the
measurement queue — ONE tunnel client at a time, CLAUDE.md trap).
"""

import importlib.util
import io
import json
import os
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("TINY", "0") == "1":
    # TINY is the CPU sanity mode; the box's sitecustomize overrides
    # JAX_PLATFORMS, so force the backend programmatically (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

CLIENTS = int(os.environ.get("CLIENTS", "32"))
REQS = int(os.environ.get("REQS", "20"))
MB = int(os.environ.get("MB", "32"))
WINDOW_MS = float(os.environ.get("WINDOW_MS", "3.0"))
BUCKETS = tuple(int(b) for b in
                os.environ.get("BUCKETS", "1,8,32").split(","))
TINY = os.environ.get("TINY", "0") == "1"  # CPU sanity runs


def _load_serve_http():
    spec = importlib.util.spec_from_file_location(
        "serve_http", os.path.join(os.path.dirname(__file__), "..",
                                   "apps", "serve_http.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_mode(mod, infer, batcher, tag):
    lock = threading.Lock()
    stats = {"requests": 0, "images": 0, "dispatches": 0, "lat_sum": 0.0}
    if batcher is not None:
        # rebind the live batcher's stats so each mode reports its own
        batcher.stats = stats
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), mod.make_handler(infer, lock, stats, False,
                                           batcher))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/infer"

    rng = np.random.RandomState(0)
    img = rng.randn(1, 256, 256, 3).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, img)
    payload = buf.getvalue()

    lats = [[] for _ in range(CLIENTS)]
    barrier = threading.Barrier(CLIENTS)

    def client(i):
        barrier.wait()
        for _ in range(REQS):
            t0 = time.perf_counter()
            r = urllib.request.urlopen(url, payload, timeout=600)
            r.read()
            lats[i].append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(CLIENTS)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    srv.shutdown()
    srv.server_close()

    flat = np.sort(np.concatenate(lats)) * 1e3
    n = CLIENTS * REQS
    rec = {
        "mode": tag, "clients": CLIENTS, "reqs": n,
        "p50_ms": round(float(np.percentile(flat, 50)), 2),
        "p99_ms": round(float(np.percentile(flat, 99)), 2),
        "img_per_sec": round(n / wall, 1),
        "dispatches": stats["dispatches"],
        "avg_batch": round(stats["images"] / max(stats["dispatches"], 1), 2),
    }
    print(f"{tag:14s}: p50 {rec['p50_ms']:8.2f} ms  "
          f"p99 {rec['p99_ms']:8.2f} ms  {rec['img_per_sec']:8.1f} img/s  "
          f"avg_batch {rec['avg_batch']:.1f} "
          f"({rec['dispatches']} dispatches)", flush=True)
    return rec


def main():
    from dir_tpu import serve
    from __graft_entry__ import _flagship

    mod = _load_serve_http()
    # QUANT / QUANT_STATIC: measure the int8 serving artifact under
    # concurrent load (same knobs as bench.py; fused Pallas layer1
    # comes off under quant — DESIGN.md §8 measured-best).
    q = int(os.environ.get("QUANT", "0"))
    qs = os.environ.get("QUANT_STATIC", "0") == "1"
    model, _, mano_l, mano_r = _flagship(
        tiny=TINY, dtype="float32" if TINY else "bfloat16",
        fused_bottleneck_eval=(not TINY) and q == 0,
        quant_backbone_eval=q >= 1, quant_decoder_eval=q >= 2,
        quant_aux_eval=q >= 3, quant_static=qs)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3)), mano_l, mano_r))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    if qs:
        from dir_tpu.ops.quant import calibrate_static_scales
        rngc = np.random.RandomState(1)
        calib = jnp.asarray(rngc.randn(8, 256, 256, 3).astype(np.float32))
        variables = calibrate_static_scales(model, variables, calib,
                                            mano_l, mano_r)
    blob = serve.export_infer(model, variables, mano_l, mano_r,
                              batch_size=None)
    path = "/tmp/bench_serve_concurrent.stablehlo"
    serve.save(path, blob)
    infer = serve.load(path)

    for b in BUCKETS:  # pay every padded-size compile before timing
        t0 = time.perf_counter()
        jax.block_until_ready(infer(np.zeros((b, 256, 256, 3), np.float32)))
        print(f"warmup b={b}: {time.perf_counter() - t0:.1f}s", flush=True)

    results = [_run_mode(mod, infer, None, "single-flight")]
    lock = threading.Lock()
    stats = {"requests": 0, "images": 0, "dispatches": 0, "lat_sum": 0.0}
    batcher = mod.MicroBatcher(infer, lock, stats, False, MB, WINDOW_MS,
                               BUCKETS)
    try:
        results.append(_run_mode(mod, infer, batcher, "micro-batched"))
    finally:
        batcher.stop()
    print("RESULTS " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
