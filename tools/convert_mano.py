"""Convert official MANO pickles to the framework's .npz asset format.

Usage:
    python tools/convert_mano.py --mano_dir <dir with MANO_*.pkl> \
        [--out ./assets/mano]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from dir_tpu.mano.assets import convert_mano_pkl  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mano_dir", type=str, required=True)
    ap.add_argument("--out", type=str, default="./assets/mano")
    opt = ap.parse_args()

    os.makedirs(opt.out, exist_ok=True)
    for side in ("left", "right"):
        src = os.path.join(opt.mano_dir, f"MANO_{side.upper()}.pkl")
        dst = os.path.join(opt.out, f"MANO_{side.upper()}.npz")
        convert_mano_pkl(src, dst, side)
        print(f"wrote {dst}")


if __name__ == "__main__":
    main()
