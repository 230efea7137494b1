"""Benchmark: DIR eval throughput on the local accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures end-to-end jitted inference images/sec on the flagship model
(ResNet-50 backbone, both MANO hands, 2 refinement stages, seg/dense
heads) at eval batch 64.

``vs_baseline``: the reference repo publishes NO throughput numbers
(BASELINE.md). The comparison constant below is an engineering estimate
of the reference PyTorch implementation's eval throughput on one A100
(fp32/TF32, batch 256): ~1000 img/s, dominated by the ResNet-50 forward
(~12 GFLOP/img) plus 12 MANO forwards + refinement. vs_baseline is
measured_imgs_per_sec / A100_EST — the BASELINE.json target is >2x on a
v5e-8 (8 chips), i.e. vs_baseline > 0.25 per chip.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os

A100_EST_IMG_PER_SEC = 1000.0
# 256 matches the reference's eval batch size (apps/eval.py:92)
BATCH = int(os.environ.get("BENCH_BATCH", "256"))
WARMUP = 3
ITERS = 10


def main():
    from __graft_entry__ import _flagship

    model, _, mano_l, mano_r = _flagship(dtype="bfloat16")
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(BATCH, 256, 256, 3).astype(np.float32))
    # Shape-only init: parameter values are irrelevant for throughput and
    # eager init would round-trip the device tunnel per op.
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img[:1], mano_l, mano_r))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def fwd(image):
        out = model.apply(variables, image, mano_l, mano_r, train=False)
        final = out["stages"][-1]
        return (final["pd_mesh_xyz_left"], final["pd_mesh_xyz_right"],
                final["pd_offset"])

    for _ in range(WARMUP):
        jax.block_until_ready(fwd(img))
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fwd(img)  # pipelined dispatch; one device sync at the end
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "dir_eval_images_per_sec",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_EST_IMG_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
