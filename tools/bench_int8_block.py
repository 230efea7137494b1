"""Microbench: fused INT8 Pallas bottleneck vs the XLA int8 static path.

The layer1-int8 serving A/B (DESIGN.md §8, 2026-08-19) moved the whole
backbone onto XLA's int8 convs at 146 TF/s with the intermediates
round-tripping HBM per conv. ``fused_bottleneck_int8_infer`` keeps the
whole block in VMEM (quantize -> 3x s8 matmuls -> dequant/relu between,
residual add) — this tool measures whether that wins per block shape,
the same protocol that qualified (layer1) and rejected (layer2) the
bf16 fused kernel.

Shapes: layer1 identity (64x64, C=256, mid=64), layer2 identity
(32x32, C=512, mid=128), optional layer3 (BENCH_L3=<bands>).
Knobs: BENCH_BATCH (256), BANDS_64 / BANDS_32 (row bands per shape).
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
ITERS = 20
BANDS_64 = int(os.environ.get("BANDS_64", "1"))
BANDS_32 = int(os.environ.get("BANDS_32", "4"))
BENCH_L3 = os.environ.get("BENCH_L3")


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt * 1e3:.3f} ms", flush=True)
    return out


def main():
    from dir_tpu.models.resnet import Bottleneck
    from dir_tpu.ops.pallas_bottleneck import (fold_bn,
                                               fused_bottleneck_int8_infer)
    from dir_tpu.ops.quant import scale_from_amax

    rng = np.random.RandomState(0)
    shapes = [(64, 256, 64, BANDS_64), (32, 512, 128, BANDS_32)]
    if BENCH_L3 is not None:
        shapes.append((16, 1024, 256, int(BENCH_L3)))
    for (h, c, mid, bands) in shapes:
        block = Bottleneck(mid, stride=1, downsample=False,
                           expansion=c // mid, dtype=jnp.bfloat16,
                           quant_eval=True, quant_static=True)
        x = jnp.asarray(rng.randn(BATCH, h, h, c).astype(np.float32)
                        ).astype(jnp.bfloat16)
        variables = block.init(jax.random.PRNGKey(0), x)
        # calibrate static scales on the bench input itself
        _, upd = jax.jit(lambda v, xx: block.apply(
            v, xx, train=False, mutable=["quant_stats"]))(variables, x)
        variables = {**variables, "quant_stats": upd["quant_stats"]}

        ref = timeit(f"xla_int8_{h}x{h}x{c}",
                     lambda xx: block.apply(variables, xx, train=False), x)

        p, s = variables["params"], variables["batch_stats"]
        folded = []
        for cn, bn in (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")):
            folded.append(fold_bn(p[cn]["kernel"], p[bn]["scale"],
                                  p[bn]["bias"], s[bn]["mean"],
                                  s[bn]["var"]))
        (w1, b1), (w2, b2), (w3, b3) = folded
        qs = jax.device_get(variables["quant_stats"])
        s1, s2, s3 = (scale_from_amax(jnp.asarray(qs[k]))
                      for k in ("conv1_in", "conv2_in", "conv3_in"))
        out = timeit(
            f"pallas_int8_{h}x{h}x{c}_bands{bands}",
            lambda xx: fused_bottleneck_int8_infer(
                xx, w1[0, 0], b1, w2, b2, w3[0, 0], b3, s1, s2, s3,
                bands=bands), x)
        err = np.max(np.abs(np.asarray(out, np.float32)
                            - np.asarray(ref, np.float32)))
        print(f"  max |pallas_int8 - xla_int8| = {err:.4f}")


if __name__ == "__main__":
    main()
