"""Offline InterHand2.6M conversion CLI (reference: dataset/prepare_data.py).

Usage:
    python tools/prepare_interhand.py --data_path <raw InterHand2.6M root> \
        --save_path ./data/interhand2.6m --mano_path ./assets/mano \
        [--splits train,test,val] [--max_samples N] [--no-render]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", type=str, required=True)
    ap.add_argument("--save_path", type=str, default="./data/interhand2.6m")
    ap.add_argument("--mano_path", type=str, default="./assets/mano")
    ap.add_argument("--splits", type=str, default="train,test,val")
    ap.add_argument("--max_samples", type=int, default=0)
    ap.add_argument("--no-render", dest="render", action="store_false")
    opt = ap.parse_args()

    from dir_tpu.data.prepare import prepare_split
    from dir_tpu.mano import load_mano_pair

    mano_l, mano_r = load_mano_pair(opt.mano_path, tips_style="data")
    for split in opt.splits.split(","):
        n = prepare_split(opt.data_path, opt.save_path, split, mano_l,
                          mano_r,
                          max_samples=opt.max_samples or None,
                          render=opt.render)
        print(f"{split}: wrote {n} frames")


if __name__ == "__main__":
    main()
