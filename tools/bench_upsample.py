"""Isolation A/B of the two upsample2x lowerings on the TPU.

The eval profile attributes 1.62 ms/step (b256) to the decoder's two
bilinear 2x upsamples (models/layers.py:upsample2x) at ~4 TF/s — ~6x
off the HBM roofline for their ~335 MB of traffic. This measures
jax.image.resize against the exact depthwise transposed-conv rewrite
(_upsample2x_tconv, UPSAMPLE_TCONV knob) on the two production shapes:

    c4_up:  (B, 8, 8, 2048)  -> (B, 16, 16, 2048)
    c3_up:  (B, 16, 16, 256) -> (B, 32, 32, 256)   [decoder_dim]

Qualify/reject protocol as every kernel experiment (DESIGN.md §7): the
isolation win must then survive an in-model bench
(UPSAMPLE_TCONV=1 BENCH_TRAIN=0 python bench.py) before the default
flips. Run queued behind flock (ONE tunnel client — CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax
import jax.numpy as jnp
import numpy as np

from dir_tpu.models.layers import _upsample2x_tconv

B = int(os.environ.get("B", "256"))
ITERS = int(os.environ.get("ITERS", "30"))
DTYPE = os.environ.get("DTYPE", "bfloat16")

SHAPES = [(B, 8, 8, 2048), (B, 16, 16, 256)]


def timeit(fn, x):
    jax.block_until_ready(fn(x))
    t = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x))
        t.append(time.perf_counter() - t0)
    return float(np.median(t) * 1e3)


def main():
    rng = np.random.RandomState(0)
    for shape in SHAPES:
        b, h, w, c = shape
        x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(DTYPE)
        resize = jax.jit(lambda v, h=h, w=w, c=c: jax.image.resize(
            v, (v.shape[0], 2 * h, 2 * w, c), method="linear"))
        tconv = jax.jit(_upsample2x_tconv)
        ms_r = timeit(resize, x)
        ms_t = timeit(tconv, x)
        gb = (x.size + x.size * 4) * x.dtype.itemsize / 1e9
        print(f"{shape}: resize {ms_r:7.3f} ms ({gb / ms_r * 1e3:6.0f} "
              f"GB/s)  tconv {ms_t:7.3f} ms ({gb / ms_t * 1e3:6.0f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
