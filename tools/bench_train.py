"""Training-step throughput benchmark (single chip or data mesh).

Times the full jitted train step (forward + ~42-term loss + backward +
AdamW + BN stats) on synthetic data at batch 64, bf16 trunk.
"""

import os
import sys
import os
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
ITERS = 10


def main():
    from dir_tpu.config import ModelConfig, TrainConfig
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
    from dir_tpu.models.dir import DIR
    from dir_tpu.train.state import create_train_state, make_optimizer
    from dir_tpu.train.steps import make_train_step

    import os as _os
    cfg = ModelConfig(dtype="bfloat16",
                      mano_precision=_os.environ.get("MANO_PREC", "high"),
                      backbone_stem=_os.environ.get("STEM", "conv7"))
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    model = DIR(cfg)

    rng = np.random.RandomState(0)
    b = BATCH
    batch = {
        "img": rng.randn(b, 256, 256, 3).astype(np.float32),
        "joint_2d_left": rng.randn(b, 21, 3).astype(np.float32),
        "joint_2d_right": rng.randn(b, 21, 3).astype(np.float32),
        "mesh_2d_left": rng.randn(b, 778, 3).astype(np.float32),
        "mesh_2d_right": rng.randn(b, 778, 3).astype(np.float32),
        "joint_3d_left": rng.randn(b, 21, 3).astype(np.float32) * 0.1,
        "joint_3d_right": rng.randn(b, 21, 3).astype(np.float32) * 0.1,
        "mesh_3d_left": rng.randn(b, 778, 3).astype(np.float32) * 0.1,
        "mesh_3d_right": rng.randn(b, 778, 3).astype(np.float32) * 0.1,
        "center_left": rng.randn(b, 1, 3).astype(np.float32) * 0.1,
        "center_right": rng.randn(b, 1, 3).astype(np.float32) * 0.1,
        "seg": rng.randint(0, 3, size=(b, 256, 256)).astype(np.int32),
        "dense": rng.rand(b, 256, 256, 3).astype(np.float32),
    }
    unroll = int(os.environ.get("UNROLL", "1"))
    if unroll > 1:
        # stacked consecutive batches (leading axis = step index)
        batch = {k: np.stack([v] * unroll) for k, v in batch.items()}
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # real (jitted) init: zero params make the robust-6D gradients blow
    # up within a few repeated steps and the loss reads as nan
    img0 = batch["img"][0, :1] if unroll > 1 else batch["img"][:1]
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img0, mano_l, mano_r))()
    tx = make_optimizer(TrainConfig(), steps_per_epoch=1000)
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, cfg, mano_l, mano_r, donate=True,
                              unroll=unroll)

    state, loss = step_fn(state, batch)  # compile
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = step_fn(state, batch)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / (ITERS * unroll)
    print(f"train_step: {dt * 1000:.2f} ms ({BATCH / dt:.0f} img/s), "
          f"unroll={unroll}, "
          f"loss={float(sum(jax.tree.map(float, loss).values())):.3f}")


if __name__ == "__main__":
    main()
