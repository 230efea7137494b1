"""Dump the train step's optimized HLO and attribute the hot fusions.

Pairs with tools/profile_train.py: the profiler names the hot fusions
(fusion.NNN); this script extracts each named computation's op metadata
(source file/line) from compiled.as_text() so the time can be attributed
to model code.
"""

import os
import re
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

HOT = os.environ.get(
    "HOT_FUSIONS",
    "fusion.998,convert_reduce_fusion.40,fusion.1746,select_and_scatter.9,"
    "fusion.996,fusion.9264,fusion.1749,fusion.407,fusion.67,fusion.1061,"
    "fusion.178,fusion.126").split(",")


def main():
    from dir_tpu.config import ModelConfig, TrainConfig
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
    from dir_tpu.models.dir import DIR
    from dir_tpu.train.state import create_train_state, make_optimizer
    from dir_tpu.train.steps import make_train_step

    cfg = ModelConfig(dtype="bfloat16")
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    model = DIR(cfg)

    rng = np.random.RandomState(0)
    b = 64
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

    compiled = jax.jit(step_fn._fun if hasattr(step_fn, "_fun")
                       else step_fn).lower(state, batch).compile()
    txt = compiled.as_text()
    out_path = "/tmp/train_step_hlo.txt"
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"HLO written to {out_path} ({len(txt)} chars)")

    for name in HOT:
        # find the computation or instruction with this name and print
        # the first metadata op_name occurrences inside it
        pat = re.compile(rf"%{re.escape(name)} [^\n]*")
        m = pat.search(txt)
        if not m:
            print(f"{name}: not found")
            continue
        line = m.group(0)
        meta = re.findall(r'op_name="([^"]+)"', line)
        calls = re.findall(r"calls=%?([\w.\-]+)", line)
        print(f"\n== {name}")
        print("  site:", line[:160])
        if calls:
            cpat = re.compile(
                rf"%{re.escape(calls[0])} \([^\n]*\n((?:[^\n]*\n)the rest)?")
        srcs = set(meta)
        # also look at the fusion computation body for op_names
        body = re.search(
            rf"^%?{re.escape(name)}(?:\.clone)? \([^)]*\) -> [^{{]+ {{(.*?)^}}",
            txt, re.S | re.M)
        if body:
            srcs |= set(re.findall(r'op_name="([^"]+)"', body.group(1)))
        for s_ in sorted(srcs)[:8]:
            print("   op:", s_[:140])


if __name__ == "__main__":
    main()
