"""Build the packed decode-once sample cache for a prepared dataset.

One pass of JPEG decode + MANO GT synthesis per split, written as
mmap-able arrays under <data_path>/<split>/packed/ — afterwards train
with data.packed_cache=True and the hot loop pays warp+normalize only
(see dir_tpu/data/sample_cache.py for the layout and the host-core
budget math).

Usage:
  python tools/build_sample_cache.py --data_path DIR [--split train]
      [--mano_path DIR | --synthetic_mano]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--split", default="train",
                    choices=("train", "test", "val"))
    ap.add_argument("--mano_path", default=None,
                    help="directory with MANO_{LEFT,RIGHT}.pkl")
    ap.add_argument("--synthetic_mano", action="store_true")
    ap.add_argument("--img_size", type=int, default=256)
    opt = ap.parse_args()

    from dir_tpu.mano import fix_left_shapedirs, synthetic_mano
    if opt.synthetic_mano:
        right = synthetic_mano("right", seed=0)
        left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    else:
        from dir_tpu.mano import load_mano_pair
        left, right = load_mano_pair(opt.mano_path)

    from dir_tpu.data.sample_cache import build_cache
    t0 = time.perf_counter()
    out = build_cache(opt.data_path, opt.split, left, right,
                      img_size=opt.img_size)
    dt = time.perf_counter() - t0
    import numpy as np
    n = np.load(os.path.join(out, "gt.npy"), mmap_mode="r").shape[0]
    print(f"built {out}: {n} samples in {dt:.1f}s "
          f"({dt / max(n, 1) * 1e3:.1f} ms/sample one-time)")


if __name__ == "__main__":
    main()
