"""Serving latency: per-request wall latency of the flagship inference
step at serving batch sizes (b=1 online, 32 micro-batch, 256 offline).

Complements bench.py's throughput headline: a server cares about the
p50 per-dispatch latency at SMALL batch, where the program is
launch/bandwidth-bound rather than MXU-bound. Measures the exact
device program the serving artifact executes (dir_tpu/serve.py exports
the same ``model.apply(..., train=False)`` step; weights ride as jit
arguments here to keep the tunnel's remote_compile payload small —
CLAUDE.md gotcha).

Batch sizes via BATCHES=1,32,256; iterations via ITERS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax
import jax.numpy as jnp
import numpy as np

BATCHES = tuple(int(b) for b in
                os.environ.get("BATCHES", "1,32,256").split(","))
ITERS = int(os.environ.get("ITERS", "30"))


def main():
    from __graft_entry__ import _flagship

    # QUANT=1/2/3 + QUANT_STATIC=1: same knobs as bench.py. Under
    # quant the fused Pallas layer1 comes OFF (the int8 path beats it
    # there — DESIGN.md §8); the fp run keeps it (measured-best).
    q = int(os.environ.get("QUANT", "0"))
    qs = os.environ.get("QUANT_STATIC", "0") == "1"
    model, _, mano_l, mano_r = _flagship(dtype="bfloat16",
                                         fused_bottleneck_eval=q == 0,
                                         quant_backbone_eval=q >= 1,
                                         quant_decoder_eval=q >= 2,
                                         quant_aux_eval=q >= 3,
                                         quant_static=qs)
    rng = np.random.RandomState(0)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3)), mano_l, mano_r))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    if qs:
        from dir_tpu.ops.quant import calibrate_static_scales
        calib = jnp.asarray(rng.randn(8, 256, 256, 3).astype(np.float32))
        variables = calibrate_static_scales(model, variables, calib,
                                            mano_l, mano_r)

    @jax.jit
    def infer(vs, img):
        out = model.apply(vs, img, mano_l, mano_r, train=False)
        final = out["stages"][-1]
        return (final["pd_mesh_xyz_left"], final["pd_mesh_xyz_right"],
                final["pd_offset"])

    for b in BATCHES:
        img = jnp.asarray(rng.randn(b, 256, 256, 3).astype(np.float32))
        jax.block_until_ready(infer(variables, img))
        lats = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            jax.block_until_ready(infer(variables, img))
            lats.append(time.perf_counter() - t0)
        lats = np.sort(np.asarray(lats)) * 1e3
        p50 = float(np.percentile(lats, 50))
        p99 = float(np.percentile(lats, 99))
        print(f"batch {b:4d}: p50 {p50:8.2f} ms  p99 {p99:8.2f} ms  "
              f"({b / p50 * 1e3:8.1f} img/s at p50)", flush=True)


if __name__ == "__main__":
    main()
