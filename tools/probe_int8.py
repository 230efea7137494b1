"""Probe: does XLA lower int8 convs / matmuls to the v5e int8 MXU path?

The eval profile's compute-bound segment (layer2+ / decoder convs,
~27.5 ms at 127 TF/s bf16 — docs/DESIGN.md §7) would have ~2x headroom
if s8xs8->s32 convs ran at the chip's int8 rate (~394 TOPS). This
one-shot probe times the layer2 conv shape and a plain matmul in bf16
vs int8 so the quantized-serving question is answered with numbers
before any quantization machinery is built.

Timing is a data-dependent lax.fori_loop of N iterations inside ONE
jitted program: per-dispatch wall timing of sub-10-ms programs through
the axon tunnel measured impossible numbers (4,400 TF/s), so each
iteration's input is derived from the previous output and the whole
chain is timed as one execute.

Measured results are recorded in docs/DESIGN.md §7.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 50


def bench(name, loop, flops, x0, x1, w):
    # args as jit ARGUMENTS: closed-over arrays inline into the
    # serialized program and the tunnel's remote_compile rejects it
    # with HTTP 413 (CLAUDE.md gotcha). The timed call uses a FRESH
    # input (x1) — repeating identical (executable, args) pairs
    # through the tunnel measured impossibly-fast times.
    f = jax.jit(loop)
    jax.block_until_ready(f(x0, w))
    t0 = time.perf_counter()
    out = f(x1, w)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    # host fetch: exposes compute that block_until_ready failed to wait
    # for (observed on the tunneled backend for some programs)
    # float() — bf16/int8 outputs come back as ml_dtypes scalars whose
    # __format__ rejects the 'f' code (crashed the round-4 probe run)
    chk = float(np.asarray(out[:1, ..., :4], np.float32).sum())
    t2 = time.perf_counter()
    dt = (t1 - t0) / ITERS
    print(f"{name}: {dt * 1e3:.3f} ms  -> {flops / dt / 1e12:.1f} T/s"
          f"   [fetch +{(t2 - t1) * 1e3:.1f} ms, chk {chk:.1f}]",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    b, h, c = 256, 32, 512
    x = rng.randn(b, h, h, c).astype(np.float32)
    k = rng.randn(3, 3, c, c).astype(np.float32) * 0.03
    xb, kb = jnp.asarray(x, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16)
    xi = jnp.asarray(np.clip(x * 10, -127, 127), jnp.int8)
    ki = jnp.asarray(np.clip(k * 300, -127, 127), jnp.int8)

    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    flops = 2 * b * h * h * 9 * c * c

    def conv_bf16(x0, w):
        def body(_, a):
            y = jax.lax.conv_general_dilated(a, w, (1, 1), "SAME",
                                             dimension_numbers=dn)
            # bounded, data-dependent chain; clip (not tanh) so the
            # epilogue cost is comparable to the int8 path's
            # shift/clip/cast and doesn't bias the rate ratio. The
            # 0.5 gain keeps the signal ~unit-scale across iterations
            # (w*0.03 over 9*512 taps has ~2x std gain).
            return jnp.clip(y * 0.5, -3.0, 3.0).astype(a.dtype)
        return jax.lax.fori_loop(0, ITERS, body, x0)

    def conv_int8(x0, w):
        def body(_, a):
            y = jax.lax.conv_general_dilated(
                a, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
        return jax.lax.fori_loop(0, ITERS, body, x0)

    x2 = rng.randn(b, h, h, c).astype(np.float32)
    xb2 = jnp.asarray(x2, jnp.bfloat16)
    xi2 = jnp.asarray(np.clip(x2 * 10, -127, 127), jnp.int8)
    bench("conv3x3_bf16", conv_bf16, flops, xb, xb2, kb)
    bench("conv3x3_int8_s32out", conv_int8, flops, xi, xi2, ki)

    m = 256 * 1024
    a = jnp.asarray(rng.randn(m, c).astype(np.float32) * 0.03, jnp.bfloat16)
    w = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.03, jnp.bfloat16)
    ai = jnp.asarray(np.clip(np.asarray(a, np.float32) * 3000, -127, 127),
                     jnp.int8)
    wi = jnp.asarray(np.clip(np.asarray(w, np.float32) * 3000, -127, 127),
                     jnp.int8)
    mflops = 2 * m * c * c

    def mm_bf16(p0, q):
        def body(_, p):
            # clip epilogue for rate-ratio symmetry (see conv_bf16)
            y = p @ q
            return jnp.clip(y * 0.5, -3.0, 3.0).astype(p.dtype)
        return jax.lax.fori_loop(0, ITERS, body, p0)

    def mm_int8(p0, q):
        def body(_, p):
            y = jax.lax.dot_general(p, q, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
        return jax.lax.fori_loop(0, ITERS, body, p0)

    a2f = rng.randn(m, c).astype(np.float32) * 0.03
    a2 = jnp.asarray(a2f, jnp.bfloat16)
    ai2 = jnp.asarray(np.clip(a2f * 100000, -127, 127), jnp.int8)
    bench("matmul_bf16", mm_bf16, mflops, a, a2, w)
    bench("matmul_int8_s32out", mm_int8, mflops, ai, ai2, wi)


if __name__ == "__main__":
    main()
