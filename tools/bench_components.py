"""Component-level TPU microbenchmarks: find the bottleneck.

Times (batch 64, bf16): backbone-only, MANO pair, one refinement stage's
splat (jnp vs pallas), and the full model. Prints one line per entry.
"""

import sys
import os
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH = 64
ITERS = 10


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt * 1000:.2f} ms/iter ({BATCH / dt:.0f} img/s)",
          flush=True)
    return dt


def main():
    from dir_tpu.config import ModelConfig
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs, \
        mano_forward_pca6d
    from dir_tpu.models.resnet import ResNetPyramid
    from dir_tpu.models.dir import DIR
    from dir_tpu.ops.bone_splat import bone_splat
    from dir_tpu.ops.pallas_bone_splat import bone_splat_pallas

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(BATCH, 256, 256, 3).astype(np.float32))

    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)

    # backbone only (both stems)
    for stem in ("conv7", "s2d"):
        bk = ResNetPyramid(dtype=jnp.bfloat16, stem=stem)
        shapes = jax.eval_shape(
            lambda: bk.init(jax.random.PRNGKey(0), img[:1]))
        bkv = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        timeit(f"backbone_{stem}", lambda x: bk.apply(bkv, x)[-1], img)

    # MANO pair (12 forwards per full model call: 2 hands x 3 stages x 2?
    # actually 2 hands x 3 stages = 6)
    pose = jnp.asarray(rng.randn(BATCH, 51).astype(np.float32))
    betas = jnp.asarray(rng.randn(BATCH, 10).astype(np.float32))
    timeit("mano_pair",
           lambda p, b: (mano_forward_pca6d(mano_l, p, b, center_idx=0)[0]
                         + mano_forward_pca6d(mano_r, p, b,
                                              center_idx=0)[0]),
           pose, betas)

    # bone splat at 32x32 (stage 2, the big one)
    uv = jnp.asarray(rng.uniform(-1, 1, (BATCH, 21, 2)).astype(np.float32))
    feat = jnp.asarray(rng.randn(BATCH, 21, 64).astype(np.float32)).astype(jnp.bfloat16)
    timeit("splat32_jnp", lambda u, f: bone_splat(u, f, 32, 2.0), uv, feat)
    timeit("splat32_pallas",
           lambda u, f: bone_splat_pallas(u, f, 32, 2.0), uv, feat)
    timeit("splat16_jnp", lambda u, f: bone_splat(u, f, 16, 1.0), uv, feat)
    timeit("splat16_pallas",
           lambda u, f: bone_splat_pallas(u, f, 16, 1.0), uv, feat)

    # full model bf16
    for use_pallas in (False, True):
        cfg = ModelConfig(dtype="bfloat16", use_pallas_splat=use_pallas)
        model = DIR(cfg)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), img[:1], mano_l,
                               mano_r))
        variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                 shapes)
        timeit(f"full_bf16_pallas={use_pallas}",
               lambda x: model.apply(variables, x, mano_l, mano_r,
                                     train=False)["stages"][-1][
                   "pd_mesh_xyz_left"], img)


if __name__ == "__main__":
    main()
