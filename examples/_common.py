"""Shared helpers for the example scripts."""


def example_steps(n):
    """Scale step counts by ERYN_TPU_EXAMPLE_SCALE (CI smoke runs set a
    small fraction; default 1.0 = the full demonstration run)."""
    import os

    return max(4, int(n * float(os.environ.get("ERYN_TPU_EXAMPLE_SCALE", "1"))))
