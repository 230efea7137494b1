"""Probe: does XLA lower int8 convs / matmuls to the v5e int8 MXU path?

The eval profile's compute-bound segment (layer2+ / decoder convs,
~27.5 ms at 127 TF/s bf16 — docs/DESIGN.md §7) would have ~2x headroom
if s8xs8->s32 convs ran at the chip's int8 rate (~394 TOPS). This
one-shot probe times the layer2 conv shape and a plain matmul in bf16
vs int8 so the quantized-serving question is answered with numbers
before any quantization machinery is built.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    b, h, c = 256, 32, 512
    x = rng.randn(b, h, h, c).astype(np.float32)
    k = rng.randn(3, 3, c, c).astype(np.float32)
    xb, kb = jnp.asarray(x, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16)
    xi = jnp.asarray(np.clip(x * 10, -127, 127), jnp.int8)
    ki = jnp.asarray(np.clip(k * 10, -127, 127), jnp.int8)

    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    flops = 2 * b * h * h * 9 * c * c

    t = bench("conv3x3_bf16", lambda a, w: jax.lax.conv_general_dilated(
        a, w, (1, 1), "SAME", dimension_numbers=dn), xb, kb)
    print(f"  -> {flops / t / 1e12:.1f} TF/s")
    t = bench("conv3x3_int8_s32out", lambda a, w: jax.lax.conv_general_dilated(
        a, w, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32), xi, ki)
    print(f"  -> {flops / t / 1e12:.1f} TOP/s")

    m = 256 * 1024
    a = jnp.asarray(rng.randn(m, c).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(c, c).astype(np.float32), jnp.bfloat16)
    ai = jnp.asarray(np.clip(np.asarray(a, np.float32) * 10, -127, 127),
                     jnp.int8)
    wi = jnp.asarray(np.clip(np.asarray(w, np.float32) * 10, -127, 127),
                     jnp.int8)
    mflops = 2 * m * c * c
    t = bench("matmul_bf16", lambda p, q: p @ q, a, w)
    print(f"  -> {mflops / t / 1e12:.1f} TF/s")
    t = bench("matmul_int8_s32out", lambda p, q: jax.lax.dot_general(
        p, q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32), ai, wi)
    print(f"  -> {mflops / t / 1e12:.1f} TOP/s")


if __name__ == "__main__":
    main()
