"""Capture a device trace of the eval forward and print the breakdown.

Pairs with tools/profile_train.py; same source-line attribution via
tools/trace_util.py. BENCH_BATCH / STEM env vars select the
configuration (defaults: batch 256, conv7 stem — the bench.py setting).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from trace_util import report  # noqa: E402

BATCH = int(os.environ.get("BENCH_BATCH", "256"))
STEM = os.environ.get("STEM", "conv7")
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/dir_tpu_eval_trace")
STEPS = 3


def main():
    from dir_tpu.config import ModelConfig
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
    from dir_tpu.models.dir import DIR

    # QUANT / QUANT_STATIC mirror bench.py's serving A/B knobs so the
    # int8 serving program can be traced too.
    quant = int(os.environ.get("QUANT", "0"))
    quant_static = os.environ.get("QUANT_STATIC", "0") == "1"
    cfg = ModelConfig(dtype="bfloat16", backbone_stem=STEM,
                      fused_bottleneck_eval=os.environ.get(
                          "FUSED_BOTTLENECK", "1") != "0",
                      quant_backbone_eval=quant >= 1,
                      quant_decoder_eval=quant >= 2,
                      quant_aux_eval=quant >= 3,
                      quant_static=quant_static)
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    model = DIR(cfg)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(BATCH, 256, 256, 3).astype(np.float32))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img[:1], mano_l, mano_r))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    if quant_static:
        from dir_tpu.ops.quant import calibrate_static_scales
        variables = calibrate_static_scales(model, variables, img,
                                            mano_l, mano_r)

    @jax.jit
    def fwd(image):
        out = model.apply(variables, image, mano_l, mano_r, train=False)
        final = out["stages"][-1]
        return (final["pd_mesh_xyz_left"], final["pd_mesh_xyz_right"],
                final["pd_offset"])

    jax.block_until_ready(fwd(img))
    jax.profiler.start_trace(TRACE_DIR)
    out = None
    for _ in range(STEPS):
        out = fwd(img)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    print(f"batch={BATCH} stem={STEM} quant={quant} static={quant_static}")
    report(TRACE_DIR, STEPS)


if __name__ == "__main__":
    main()
