"""Input-pipeline benchmark: host-cv2 vs host-native-warp vs device.

Measures per-sample latency / samples-per-second of the three training
input paths on synthetic data in the reference on-disk layout:

  a) host pipeline, cv2 warp (production default)
  b) host pipeline, native C++ warp (data.native_warp=True)
  c) fused on-device pipeline (data.device_pipeline=True) — optional,
     runs on the active JAX backend (pass --device; on this box that is
     the tunneled TPU, run exclusively)

Usage: python tools/bench_input_pipeline.py [--device] [--n 64]
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
    ap.add_argument("--n", type=int, default=64,
                    help="samples per measurement")
    ap.add_argument("--device", action="store_true",
                    help="also benchmark the on-device pipeline")
    ap.add_argument("--batch", type=int, default=16)
    opt = ap.parse_args()

    if not opt.device:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from dir_tpu.data import synthetic
    from dir_tpu.data.interhand import InterHandDataset
    from dir_tpu.mano import fix_left_shapedirs, synthetic_mano

    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    tmp = tempfile.mkdtemp(prefix="bench_input_")
    n_disk = 16
    synthetic.generate(tmp, left, right, split="train",
                       num_samples=n_disk)
    print(f"synthetic dataset: {n_disk} samples at {tmp}")

    def bench_host(native_warp: bool) -> float:
        ds = InterHandDataset(tmp, "train", left, right,
                              native_warp=native_warp)
        for i in range(4):  # warmup (page cache, lib load)
            ds[i % n_disk]
        t0 = time.perf_counter()
        for i in range(opt.n):
            ds[i % n_disk]
        return (time.perf_counter() - t0) / opt.n

    t_cv2 = bench_host(False)
    t_native = bench_host(True)
    print(f"host cv2 warp:    {t_cv2 * 1e3:7.2f} ms/sample "
          f"({1 / t_cv2:7.1f} samples/s/worker)")
    print(f"host native warp: {t_native * 1e3:7.2f} ms/sample "
          f"({1 / t_native:7.1f} samples/s/worker)")

    if opt.device:
        import jax
        import numpy as np

        from dir_tpu.data.device_pipeline import (RawInterHandDataset,
                                                  make_preprocess_fn)
        from dir_tpu.data.loader import BatchLoader

        ds = RawInterHandDataset(tmp, "train")
        pre = make_preprocess_fn(left, right, train=True)
        loader = BatchLoader(ds, opt.batch, shuffle=False, drop_last=True,
                             num_threads=2)
        key = jax.random.PRNGKey(0)
        batches = list(loader)
        raw = {k: v for k, v in batches[0].items() if k != "_valid"}
        out = pre(raw, key)  # compile
        jax.block_until_ready(out)
        iters = max(1, opt.n // opt.batch)
        t0 = time.perf_counter()
        for i in range(iters):
            out = pre(raw, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        t_dev = (time.perf_counter() - t0) / (iters * opt.batch)
        print(f"device pipeline:  {t_dev * 1e3:7.2f} ms/sample "
              f"({1 / t_dev:7.1f} samples/s, backend="
              f"{jax.default_backend()}; host JPEG decode excluded)")


if __name__ == "__main__":
    main()
