"""Infra utilities: logging, profiling, misc."""
