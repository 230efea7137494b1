"""Capture a device trace of the train step and print the op breakdown
(per HLO category + per source line, via tools/trace_util.py)."""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from trace_util import report  # noqa: E402

BATCH = 64
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/dir_tpu_trace")


def main():
    from dir_tpu.config import ModelConfig, TrainConfig
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
    from dir_tpu.models.dir import DIR
    from dir_tpu.train.state import create_train_state, make_optimizer
    from dir_tpu.train.steps import make_train_step

    cfg = ModelConfig(dtype="bfloat16",
                      mano_precision=os.environ.get("MANO_PREC", "high"),
                      backbone_stem=os.environ.get("STEM", "conv7"))
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
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch["img"][:1], mano_l, mano_r))()
    tx = make_optimizer(TrainConfig(), steps_per_epoch=1000)
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, cfg, mano_l, mano_r, donate=False)

    state, loss = step_fn(state, batch)
    jax.block_until_ready(loss)

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        state, loss = step_fn(state, batch)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()

    report(TRACE_DIR, steps=3)


if __name__ == "__main__":
    main()
