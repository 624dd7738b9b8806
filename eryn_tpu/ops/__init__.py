"""Low-level compute kernels (masked choice, segment reductions, pallas)."""
