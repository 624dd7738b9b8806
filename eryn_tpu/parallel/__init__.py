"""Multi-chip scaling: device meshes and sharded sampler steps."""
