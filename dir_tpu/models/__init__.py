"""Network components and the DIR model family (flax.linen, NHWC)."""
