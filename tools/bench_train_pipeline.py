"""Sustained end-to-end train throughput through the REAL input pipeline.

VERDICT r4 #3: the 60 ms/step device rate was measured on pre-staged
device batches; this tool measures what the full system sustains when
the host loader actually feeds the train step, for both host paths:

  a) jpg:    InterHandDataset — JPEG decode + numpy MANO GT + aug per
             sample, every epoch (the reference's DataLoader model,
             train.py:208-220)
  b) cached: CachedInterHandDataset — packed decode-once mmap cache
             (dir_tpu/data/sample_cache.py); hot loop pays aug only

Also prints the host-only loader rate of each path (no device in the
loop) so the host budget is explicit: cores_needed = device_img_s /
host_img_s_per_core.

Usage:
  python tools/bench_train_pipeline.py [--device] [--steps 20]
      [--batch 64] [--samples 256] [--threads 4]

--device runs the jitted train step on the active backend (the
tunneled TPU on this box — run EXCLUSIVELY, one TPU client at a time).
Without it, host-only loader rates on CPU.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--samples", type=int, default=256,
                    help="on-disk synthetic dataset size")
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--device", action="store_true",
                    help="feed the real jitted train step (TPU)")
    ap.add_argument("--paths", default="jpg,cached")
    opt = ap.parse_args()

    if not opt.device:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from dir_tpu.data import synthetic
    from dir_tpu.data.interhand import InterHandDataset
    from dir_tpu.data.loader import BatchLoader
    from dir_tpu.data.sample_cache import (CachedInterHandDataset,
                                           build_cache)
    from dir_tpu.mano import fix_left_shapedirs, synthetic_mano

    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    tmp = tempfile.mkdtemp(prefix="bench_train_pipe_")
    t0 = time.perf_counter()
    synthetic.generate(tmp, left, right, split="train",
                       num_samples=opt.samples)
    print(f"synthetic dataset: {opt.samples} samples at {tmp} "
          f"({time.perf_counter() - t0:.1f}s)")
    t0 = time.perf_counter()
    build_cache(tmp, "train", left, right, log_every=0)
    t_build = time.perf_counter() - t0
    print(f"packed cache built in {t_build:.1f}s "
          f"({t_build / opt.samples * 1e3:.1f} ms/sample one-time)")

    def make_ds(path):
        cls = CachedInterHandDataset if path == "cached" else \
            InterHandDataset
        return cls(tmp, "train", left, right)

    paths = opt.paths.split(",")

    # --- host-only loader rate -----------------------------------------
    host_rate = {}
    for path in paths:
        loader = BatchLoader(make_ds(path), opt.batch, shuffle=True,
                             drop_last=True, num_threads=opt.threads)
        for b in loader:  # warmup epoch: page cache, thread pool
            pass
        n = 0
        t0 = time.perf_counter()
        for b in loader:
            n += opt.batch
        dt = time.perf_counter() - t0
        host_rate[path] = n / dt
        print(f"host-only  {path:7s}: {n / dt:8.1f} img/s "
              f"({dt / n * 1e3:6.2f} ms/img, {opt.threads} threads)")

    if not opt.device:
        return

    # --- loader-fed train step ------------------------------------------
    import jax
    import jax.numpy as jnp

    from dir_tpu.config import Config
    from dir_tpu.train.state import create_train_state, make_optimizer
    from dir_tpu.train.steps import make_train_step
    from dir_tpu.models.dir import DIR

    cfg = Config()
    model = DIR(cfg.model)
    tx = make_optimizer(cfg.train, steps_per_epoch=1000)

    # init via eval_shape + zeros (never run eager through the tunnel)
    sample_img = jnp.zeros((opt.batch, 256, 256, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), sample_img[:1],
                           left, right))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg.model, left, right)

    drop = ("img_rgb", "camera", "_valid")

    def device_batch(b):
        return {k: jnp.asarray(v) for k, v in b.items() if k not in drop}

    for path in paths:
        loader = BatchLoader(make_ds(path), opt.batch, shuffle=True,
                             drop_last=True, num_threads=opt.threads)
        it = iter(loader)
        b = device_batch(next(it))
        state, loss = step(state, b)   # compile
        jax.block_until_ready(loss["total"] if "total" in loss
                              else jax.tree.leaves(loss)[0])
        done = 0
        t0 = time.perf_counter()
        while done < opt.steps:
            try:
                b = device_batch(next(it))
            except StopIteration:
                it = iter(loader)
                continue
            state, loss = step(state, b)
            done += 1
        jax.block_until_ready(jax.tree.leaves(loss)[0])
        dt = time.perf_counter() - t0
        rate = done * opt.batch / dt
        print(f"loader-fed {path:7s}: {rate:8.1f} img/s sustained "
              f"({dt / done * 1e3:6.1f} ms/step, {done} steps, "
              f"backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
