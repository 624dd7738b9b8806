"""Permutation utilities for the traced hot path.

TPU-first note: ``jnp.argsort(perm)`` — the obvious way to invert a
permutation — lowers to a full bitonic sort (~3 us at n=200 on v5e,
serial and latency-bound inside the step scan).  Inverting a permutation
needs no sort: it is a one-hot contraction that XLA lowers to a single
small reduce fusion (<1 us).  Integer arithmetic throughout, so the
result is exactly ``argsort(perm)`` bit for bit.

(The permutation DRAW itself — sorting random u32 keys — is left alone:
that sort defines the sampled permutation, and replacing it would change
the proposal stream and invalidate the statistical sweep captures.)
"""

import jax.numpy as jnp

__all__ = ["invert_permutation"]


def invert_permutation(perm):
    """Exact inverse of a ``(..., n)`` integer permutation, without a sort.

    ``inv[perm[j]] = j`` computed as ``inv[i] = sum_j [perm[j] == i] * j``
    — one ``(..., n, n)`` equality + masked integer row-sum, fused by XLA.
    Inverts along the last axis (batch dims broadcast).
    """
    n = perm.shape[-1]
    iot = jnp.arange(n, dtype=perm.dtype)
    hit = perm[..., None, :] == iot[:, None]  # [..., i, j]: j = inv[i]
    return jnp.sum(jnp.where(hit, iot, 0), axis=-1)
