"""Data pipeline: InterHand2.6M loading, augmentation, synthetic data."""
