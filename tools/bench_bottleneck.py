"""Microbench: fused Pallas bottleneck vs the XLA flax block (inference).

Shapes: layer1 (64x64, C=256, mid=64) and layer2 (32x32, C=512,
mid=128) at batch 256 — the HBM-bound early backbone blocks.
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
# Row bands for the 32x32 shape (BANDS=4 -> _kernel_banded). The
# unbanded kernel's Mosaic compile does not terminate at that shape
# (pallas_bottleneck.py header), so without BANDS the 32x32 Pallas
# variant is skipped. Measured: 2.566 (bands4) vs 3.709 ms XLA.
BANDS = int(os.environ.get("BANDS", "4"))
# Opt-in: also measure the layer3 shape (16x16x1024, mid 256) with
# BENCH_L3=<bands> (0 = whole-map kernel). Expected compute-bound in
# XLA's favor; kept for one-shot measurement, not the default run.
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
    from dir_tpu.ops.pallas_bottleneck import fold_bn, fused_bottleneck_infer

    rng = np.random.RandomState(0)
    shapes = [(64, 256, 64), (32, 512, 128)]
    if BENCH_L3 is not None:
        shapes.append((16, 1024, 256))
    for (h, c, mid) in shapes:
        block = Bottleneck(mid, stride=1, downsample=False,
                           expansion=c // mid, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.randn(BATCH, h, h, c).astype(np.float32)
                        ).astype(jnp.bfloat16)
        variables = block.init(jax.random.PRNGKey(0), x)

        ref = timeit(f"xla_block_{h}x{h}x{c}",
                     lambda xx: block.apply(variables, xx, train=False), x)

        p, s = variables["params"], variables["batch_stats"]
        folded = []
        for cn, bn in (("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3")):
            folded.append(fold_bn(p[cn]["kernel"], p[bn]["scale"],
                                  p[bn]["bias"], s[bn]["mean"],
                                  s[bn]["var"]))
        (w1, b1), (w2, b2), (w3, b3) = folded
        bands = {64: 0, 32: BANDS, 16: int(BENCH_L3 or 0)}[h]
        if h == 32 and not BANDS:
            print(f"pallas_fused_{h}x{h}x{c}: skipped "
                  "(unbanded Mosaic compile hangs; set BANDS=4)")
            continue
        out = timeit(
            f"pallas_fused_{h}x{h}x{c}" + (f"_bands{bands}" if bands
                                           else ""),
            lambda xx: fused_bottleneck_infer(xx, w1[0, 0], b1, w2, b2,
                                              w3[0, 0], b3,
                                              bands=bands), x)
        err = np.max(np.abs(np.asarray(out, np.float32)
                            - np.asarray(ref, np.float32)))
        print(f"  max |fused - xla| = {err:.4f}")


if __name__ == "__main__":
    main()
