"""Serving-artifact roundtrip tests (dir_tpu/serve.py, jax.export).

The reference has no export/serving surface (eval rebuilds the model
from source, apps/eval.py:87-138); these tests pin the new capability:
serialize the jitted inference step to a StableHLO artifact, reload it
WITHOUT the model/flax/MANO objects, and get bit-identical outputs on
the same backend.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full tiny-model CPU compiles

from dir_tpu.config import ModelConfig
from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
from dir_tpu.models.dir import DIR
from dir_tpu import serve

CFG = ModelConfig(backbone_layers=(1, 1, 1, 1))


@pytest.fixture(scope="module")
def setup():
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    model = DIR(CFG)
    img = jnp.zeros((2, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, mano_l, mano_r)
    return model, variables, mano_l, mano_r


def test_export_roundtrip_fixed_batch(setup, rng, tmp_path):
    model, variables, mano_l, mano_r = setup
    blob = serve.export_infer(model, variables, mano_l, mano_r,
                              batch_size=2)
    assert blob.startswith(serve._MAGIC)

    path = str(tmp_path / "dir.stablehlo")
    serve.save(path, blob)
    fn = serve.load(path)

    img = jnp.asarray(rng.randn(2, 256, 256, 3).astype(np.float32))
    got = fn(img)
    want = model.apply(variables, img, mano_l, mano_r, train=False)
    assert len(got["stages"]) == len(want["stages"])
    for gs, ws in zip(got["stages"], want["stages"]):
        for k in ws:
            np.testing.assert_allclose(
                np.asarray(gs[k]), np.asarray(ws[k]), rtol=1e-5,
                atol=1e-5, err_msg=k)


def test_export_symbolic_batch(setup, rng):
    """One artifact, every batch size (symbolic leading dim)."""
    model, variables, mano_l, mano_r = setup
    blob = serve.export_infer(model, variables, mano_l, mano_r,
                              batch_size=None)
    fn = serve.load_infer(blob)
    for b in (1, 3):
        img = jnp.asarray(rng.randn(b, 256, 256, 3).astype(np.float32))
        got = fn(img)
        want = model.apply(variables, img, mano_l, mano_r, train=False)
        np.testing.assert_allclose(
            np.asarray(got["stages"][-1]["pd_mesh_xyz_left"]),
            np.asarray(want["stages"][-1]["pd_mesh_xyz_left"]),
            rtol=1e-5, atol=1e-5)


def test_export_symbolic_batch_fused(rng):
    """Symbolic-batch export with the fused Pallas bottleneck enabled.

    Regression: pl.CostEstimate requires int fields, but under a
    symbolic batch dim the flops term is a _DimExpr — cost_if_static
    must drop the estimate instead of crashing the export trace
    (observed live in tools/bench_serve_concurrent.py on TPU)."""
    cfg = ModelConfig(backbone_layers=(1, 1, 1, 1),
                      fused_bottleneck_eval=True)
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    model = DIR(cfg)
    img = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, mano_l, mano_r)
    blob = serve.export_infer(model, variables, mano_l, mano_r,
                              batch_size=None)
    assert blob.startswith(serve._MAGIC)


def test_export_symbolic_batch_quant_static(rng):
    """Symbolic-batch export of the calibrated int8 serving config
    (QUANT=3 static — the measured-best deployment mode): the
    quant_stats amaxes embed in the artifact as constants and the
    loaded function reproduces the live model on any batch size.

    Tolerance: the symbolic-batch program fuses differently from the
    live jit, so activations sitting exactly on an int8 rounding
    boundary can flip by one quantum (observed diffs ~2e-6 m on 23% of
    mesh vertices — the same partition-dependent-fusion effect as the
    sharded-eval quant test, test_apps_cli.py). 5e-4 m passes quantum
    noise and still fails on any real wiring bug (wrong scale/conv
    routes are >1e-2)."""
    from dir_tpu.ops.quant import calibrate_static_scales

    cfg = ModelConfig(backbone_layers=(1, 1, 1, 1),
                      quant_backbone_eval=True, quant_decoder_eval=True,
                      quant_aux_eval=True, quant_static=True)
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    model = DIR(cfg)
    img0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img0, mano_l, mano_r)
    calib = jnp.asarray(rng.randn(2, 256, 256, 3).astype(np.float32))
    variables = calibrate_static_scales(model, variables, calib,
                                        mano_l, mano_r)
    blob = serve.export_infer(model, variables, mano_l, mano_r,
                              batch_size=None)
    fn = serve.load_infer(blob)
    img = jnp.asarray(rng.randn(3, 256, 256, 3).astype(np.float32))
    got = fn(img)
    want = model.apply(variables, img, mano_l, mano_r, train=False)
    np.testing.assert_allclose(
        np.asarray(got["stages"][-1]["pd_mesh_xyz_left"]),
        np.asarray(want["stages"][-1]["pd_mesh_xyz_left"]),
        rtol=0, atol=5e-4)


def test_load_rejects_foreign_blob():
    with pytest.raises(ValueError, match="bad magic"):
        serve.load_infer(b"not an artifact")


def test_http_server_roundtrip(setup, rng, tmp_path):
    """apps/serve_http.py end-to-end on a live socket: healthz, /infer
    with an .npy body -> .npz response matching the direct model call,
    /stats accounting, and a 400 on a malformed body."""
    import importlib.util
    import io
    import json
    import os
    import threading
    import urllib.error
    import urllib.request

    model, variables, mano_l, mano_r = setup
    blob = serve.export_infer(model, variables, mano_l, mano_r,
                              batch_size=None)
    path = str(tmp_path / "dir.stablehlo")
    serve.save(path, blob)

    spec = importlib.util.spec_from_file_location(
        "serve_http", os.path.join(os.path.dirname(__file__), "..",
                                   "apps", "serve_http.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    srv = mod.make_server(path, port=0)  # OS-assigned free port
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok"

        img = rng.randn(2, 256, 256, 3).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, img)
        resp = urllib.request.urlopen(f"{base}/infer", buf.getvalue(),
                                      timeout=300)
        out = np.load(io.BytesIO(resp.read()))
        want = model.apply(variables, jnp.asarray(img), mano_l, mano_r,
                           train=False)["stages"][-1]
        np.testing.assert_allclose(out["mesh_xyz_left"],
                                   np.asarray(want["pd_mesh_xyz_left"]),
                                   rtol=1e-5, atol=1e-5)
        assert out["offset"].shape == (2, 3)

        stats = json.loads(
            urllib.request.urlopen(f"{base}/stats").read())
        assert stats["requests"] == 1 and stats["images"] == 2
        assert stats["avg_latency_ms"] > 0

        try:
            urllib.request.urlopen(f"{base}/infer", b"garbage")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_microbatching(setup, rng, tmp_path):
    """Concurrent b=1 requests coalesce into fewer device dispatches
    (MicroBatcher), pad up to the bucket size, and every request still
    gets ITS OWN rows — outputs match the direct model call."""
    import importlib.util
    import io
    import json
    import os
    import threading
    import urllib.request

    model, variables, mano_l, mano_r = setup
    blob = serve.export_infer(model, variables, mano_l, mano_r,
                              batch_size=None)
    path = str(tmp_path / "dir.stablehlo")
    serve.save(path, blob)

    spec = importlib.util.spec_from_file_location(
        "serve_http", os.path.join(os.path.dirname(__file__), "..",
                                   "apps", "serve_http.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # long window: the 4 concurrent requests below must coalesce even
    # on a loaded 1-core CI host
    srv = mod.make_server(path, port=0, max_batch=8, window_ms=2000.0,
                          buckets=(8,))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        imgs = [rng.randn(1, 256, 256, 3).astype(np.float32)
                for _ in range(4)]
        outs = [None] * 4

        def post(i):
            buf = io.BytesIO()
            np.save(buf, imgs[i])
            r = urllib.request.urlopen(f"{base}/infer", buf.getvalue(),
                                       timeout=600)
            outs[i] = dict(np.load(io.BytesIO(r.read())))

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert all(o is not None for o in outs)

        want = model.apply(variables, jnp.asarray(np.concatenate(imgs)),
                           mano_l, mano_r, train=False)["stages"][-1]
        for i, out in enumerate(outs):
            np.testing.assert_allclose(
                out["mesh_xyz_left"],
                np.asarray(want["pd_mesh_xyz_left"])[i:i + 1],
                rtol=2e-4, atol=2e-4)
            assert out["offset"].shape == (1, 3)

        stats = json.loads(urllib.request.urlopen(f"{base}/stats").read())
        assert stats["requests"] == 4
        assert stats["images"] == 4  # pad rows not counted
        assert stats["dispatches"] < 4  # coalescing actually happened
        assert stats["avg_batch"] > 1
    finally:
        srv.batcher.stop()
        srv.shutdown()
        srv.server_close()
