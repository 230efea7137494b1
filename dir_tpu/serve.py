"""AOT model export and serving via jax.export (StableHLO artifacts).

The reference has no deployment story — serving it means carrying the
whole research repo, torch, manopth, and the MANO pkls to the serving
host and re-tracing the model there (apps/eval.py:87-138 rebuilds
everything from source). The TPU-native path lowers the jitted
inference step ONCE, serializes it as a versioned StableHLO artifact
(weights and MANO constant tensors embedded), and reloads it with zero
model code: no flax module, no MANO assets, no checkpoint conversion at
serving time. The artifact carries jax.export's cross-version
compatibility guarantees and executes on any XLA backend (TPU serving,
CPU smoke tests).

Batch handling: exported with jax.export symbolic batch dimension when
``batch_size`` is None — one artifact serves every batch size — else a
fixed shape (XLA can specialize harder; matches the reference eval's
fixed batch 256, apps/eval.py:92).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import export as jax_export

# Artifact header: magic + version, so load() fails loudly on foreign
# files rather than handing garbage to the StableHLO deserializer.
_MAGIC = b"DIRTPU-SERVE-v1\n"


def export_infer(model, variables, mano_left, mano_right,
                 batch_size: Optional[int] = None, img_size: int = 256,
                 platforms: Optional[list] = None) -> bytes:
    """Serialize the inference step ``img -> stage outputs``.

    variables / MANO models are captured as artifact constants — the
    serving side needs only this blob. ``platforms`` defaults to the
    current backend; pass e.g. ["tpu", "cpu"] for a multi-platform
    artifact.
    """

    def step(img):
        return model.apply(variables, img, mano_left, mano_right,
                           train=False)

    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size
    spec = jax.ShapeDtypeStruct((b, img_size, img_size, 3), jnp.float32)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = tuple(platforms)
    exp = jax_export.export(jax.jit(step), **kwargs)(spec)
    return _MAGIC + exp.serialize()


def load_infer(blob: bytes) -> Callable:
    """Deserialize an artifact into a jitted ``img -> outputs`` callable.

    The returned function re-raises jax.export's shape errors if the
    input doesn't match the exported (possibly symbolic) spec.
    """
    if not blob.startswith(_MAGIC):
        raise ValueError("not a dir_tpu serving artifact (bad magic)")
    exp = jax_export.deserialize(blob[len(_MAGIC):])
    return jax.jit(exp.call)


def save(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load(path: str) -> Callable:
    with open(path, "rb") as f:
        return load_infer(f.read())
