"""Training / evaluation runtime."""
