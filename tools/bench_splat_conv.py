"""Microbench: spatial-pass variants of the factored splat-conv.

Variants (all exact, same math):
  a) nine shifted K=80 matmuls (current implementation)
  b) one unfolded K=720 matmul (windows concatenated channel-wise)
  c) per-sample 3x3 convolution via batch_group_count

Times fwd and fwd+bwd at the stage-2 shape (B=64, S=32, C=64, O=256).
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax
import jax.numpy as jnp
import numpy as np

B, S, C, O = 64, 32, 64, 256
J = 80  # (hand, endpoint, bone) combinations


def spatial_9mm(wtil, g):
    b = wtil.shape[0]
    pad = jnp.pad(wtil, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b, S * S, O), g.dtype)
    for dy in range(3):
        for dx in range(3):
            win = pad[:, dy:dy + S, dx:dx + S].reshape(b, S * S, J)
            out = out + jnp.einsum("bpj,bjo->bpo", win, g[:, dy, dx])
    return out.reshape(b, S, S, O)


def spatial_unfold(wtil, g):
    b = wtil.shape[0]
    pad = jnp.pad(wtil, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wins = [pad[:, dy:dy + S, dx:dx + S]
            for dy in range(3) for dx in range(3)]
    wun = jnp.concatenate(wins, axis=-1).reshape(b, S * S, 9 * J)
    return jnp.einsum("bpk,bko->bpo", wun,
                      g.reshape(b, 9 * J, O)).reshape(b, S, S, O)


def spatial_groupconv(wtil, g):
    b = wtil.shape[0]
    # per-sample kernels via batch groups: kernel (3, 3, J, B*O)
    k = jnp.transpose(g, (1, 2, 3, 0, 4)).reshape(3, 3, J, b * O)
    out = jax.lax.conv_general_dilated(
        wtil, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        batch_group_count=b)
    return out.reshape(b, S, S, O)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    print(f"{name}: {dt * 1e3:.3f} ms", flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    wtil = jnp.asarray(rng.rand(B, S, S, J).astype(np.float32)).astype(
        jnp.bfloat16)
    g = jnp.asarray(rng.randn(B, 3, 3, J, O).astype(np.float32)).astype(
        jnp.bfloat16)

    outs = {}
    for name, fn in (("9mm", spatial_9mm), ("unfold", spatial_unfold),
                     ("groupconv", spatial_groupconv)):
        outs[name] = np.asarray(timeit(f"fwd_{name}", fn, wtil, g),
                                np.float32)

        def loss(w, gg, fn=fn):
            return jnp.sum(fn(w, gg).astype(jnp.float32) ** 2)

        timeit(f"fwdbwd_{name}", jax.grad(loss, argnums=(0, 1)), wtil, g)

    for name in ("unfold", "groupconv"):
        err = np.max(np.abs(outs[name] - outs["9mm"]))
        print(f"max |{name} - 9mm| = {err:.5f}")


if __name__ == "__main__":
    main()
