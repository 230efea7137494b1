"""Training-convergence smoke on the real accelerator (VERDICT r3 #5).

Nothing had demonstrated the FULL flagship train step (ResNet-50
backbone, both MANO hands, ~42-term loss, AdamW) decreasing its loss on
device — the CPU tier overfits a tiny backbone only
(tests/test_train_e2e.py). This runs a few hundred optimizer steps on a
fixed synthetic MANO-consistent batch (dir_tpu/data/synthetic.py, aug
off — the reference's own training semantics minus the licensed data,
reference train.py:58-100) and logs the loss curve plus the steady-state
wall ms/step, which should match bench.py's train number (~61 ms @ b64).

Overfitting one fixed batch is the standard optimizer-sanity smoke: the
loss must fall monotone-ish; a wiring bug (wrong stop_gradient, BN stat
leak, donated-buffer aliasing, lr-schedule skew) shows up as a flat or
exploding curve.

    python tools/convergence_tpu.py            # 320 steps, unroll 8
    STEPS=80 UNROLL=4 python tools/convergence_tpu.py

Prints one ``step=... loss=...`` line per dispatch group and a final
JSON summary line. Results recorded in docs/STATUS.md.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax

# Honor JAX_PLATFORMS=cpu for hermetic smokes: the box's sitecustomize
# registers the tunneled TPU backend and overrides the env var, so the
# config must be set programmatically BEFORE the first backend init
# (CLAUDE.md trap).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from dir_tpu.config import ModelConfig, TrainConfig
    from dir_tpu.data import synthetic
    from dir_tpu.data.interhand import InterHandDataset
    from dir_tpu.data.loader import collate
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
    from dir_tpu.models.dir import DIR
    from dir_tpu.train.state import create_train_state, make_optimizer
    from dir_tpu.train.steps import make_train_step

    batch_size = int(os.environ.get("BATCH", "64"))
    unroll = int(os.environ.get("UNROLL", "8"))
    steps = int(os.environ.get("STEPS", "320"))
    assert steps % unroll == 0, (steps, unroll)

    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)

    # Fixed MANO-consistent batch: synthetic frames through the real
    # dataset path (aug off -> deterministic GT tensors).
    tmp = tempfile.mkdtemp(prefix="dir_tpu_conv_")
    synthetic.generate(tmp, left, right, split="train",
                       num_samples=batch_size)
    ds = InterHandDataset(tmp, "train", left, right, augment_train=False)
    host_batch = collate([ds[i] for i in range(batch_size)])
    host_batch = {k: v for k, v in host_batch.items() if k != "_valid"}

    # LAYERS=1,1,1,1 shrinks the backbone for a CPU wiring check; the
    # TPU smoke runs the flagship default (3,4,6,3).
    layers = tuple(int(x) for x in
                   os.environ.get("LAYERS", "3,4,6,3").split(","))
    cfg = ModelConfig(dtype="bfloat16", mano_precision="high",
                      backbone_layers=layers)
    model = DIR(cfg)
    img0 = jnp.asarray(host_batch["img"][:1])
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), img0, left, right))()
    # steps_per_epoch=1000 keeps the epoch-quantized cosine at epoch 0
    # for the whole smoke -> constant lr 5e-4, the reference's setting
    # (config.py:22-23).
    tx = make_optimizer(TrainConfig(), steps_per_epoch=1000)
    state = create_train_state(variables, tx)
    step_fn = make_train_step(model, tx, cfg, left, right, unroll=unroll)

    if unroll > 1:
        dev_batch = {k: jnp.asarray(np.stack([v] * unroll))
                     for k, v in host_batch.items()}
    else:
        dev_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

    curve = []
    times = []
    t_start = time.perf_counter()
    for i in range(steps // unroll):
        t0 = time.perf_counter()
        state, loss = step_fn(state, dev_batch)
        total = float(sum(jax.tree.leaves(loss))[()]
                      if isinstance(loss, dict) else loss)
        dt = time.perf_counter() - t0
        times.append(dt / unroll)
        curve.append(total)
        print(f"step={(i + 1) * unroll:4d} loss={total:.4f} "
              f"({dt / unroll * 1000:.1f} ms/step)", flush=True)
        if not np.isfinite(total):
            print(json.dumps({"ok": False, "error": "non-finite loss",
                              "step": (i + 1) * unroll}))
            sys.exit(1)

    if os.environ.get("SAVE"):
        # persist the converged weights (e.g. for
        # tools/quant_accuracy.py --model <SAVE>/latest — VERDICT r4 #5:
        # re-measure int8 deltas on trained rather than random weights)
        from dir_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(os.environ["SAVE"], jax.device_get(state),
                        steps, "latest")
        print(f"saved checkpoint to {os.environ['SAVE']}/latest",
              flush=True)

    # steady state: skip the first (compile) dispatch
    ms_per_step = float(np.median(times[1:]) * 1000) if len(times) > 1 \
        else float(times[0] * 1000)
    summary = {
        "ok": bool(curve[-1] < curve[0]),
        "steps": steps, "batch": batch_size, "unroll": unroll,
        "loss_first": round(curve[0], 4), "loss_last": round(curve[-1], 4),
        "loss_min": round(min(curve), 4),
        "ms_per_step_median": round(ms_per_step, 2),
        "wall_s": round(time.perf_counter() - t_start, 1),
    }
    print(json.dumps(summary))
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
