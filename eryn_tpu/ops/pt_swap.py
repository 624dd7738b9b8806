"""Fused parallel-tempering swap cascade as a single pallas TPU kernel.

The rung cascade (``tempering.py`` swap loop) is inherently sequential over
``ntemps - 1`` rungs but touches only the tiny ``(ntemps, nwalkers)``
log-likelihood matrix plus a provenance index.  In XLA each rung lowers to a
handful of small kernels (~30 us/rung of launch overhead); here the whole
cascade runs in ONE pallas kernel with everything resident in VMEM.

Pairing: rung ``i`` walker ``w`` swaps with rung ``i-1`` walker
``(w + shift_i) mod nwalkers``.  Combined with a fresh uniform relabeling of
the walker axis per cascade (applied by the caller), each rung's pairing is a
uniformly-relabeled random rotation — a valid state-independent bijection for
the Metropolis swap (the reference draws two full permutations per rung;
statistically equivalent randomization, hardware-friendly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pt_swap_cascade"]


def _cascade_kernel(ntemps, nwalkers, dbetas_ref, shifts_ref, data_ref,
                    racc_ref, out_ref, sel_ref):
    out_ref[:] = data_ref[:]
    ia = jax.lax.broadcasted_iota(jnp.int32, (nwalkers, nwalkers), 0)
    ib = jax.lax.broadcasted_iota(jnp.int32, (nwalkers, nwalkers), 1)
    diff = jnp.mod(ia - ib + nwalkers, nwalkers)
    for i in range(ntemps - 1, 0, -1):
        dbeta = dbetas_ref[i - 1, 0]
        s = shifts_ref[i - 1, 0]

        row_i = out_ref[i]  # (2, nw): [0] = logl, [1] = provenance
        row_i1 = out_ref[i - 1]

        # rotation by a traced offset as a one-hot matmul (MXU). precision
        # HIGHEST forces exact f32 passes — the provenance channel carries
        # integer indices that must survive bit-exactly.
        shift_mat = (diff == s).astype(out_ref.dtype)  # (nw, nw)
        rolled = jnp.dot(
            row_i1,
            shift_mat,
            preferred_element_type=out_ref.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

        pacc = dbeta * (row_i[0:1] - rolled[0:1])  # (1, nw)
        sel = pacc > racc_ref[i - 1]  # (1, nw)

        new_i = jnp.where(sel, rolled, row_i)
        new_i1_rolled = jnp.where(sel, row_i, rolled)
        # inverse rotation: new_i1[v] = new_i1_rolled[(v - s) % nw]
        new_i1 = jnp.dot(
            new_i1_rolled,
            shift_mat.T,
            preferred_element_type=out_ref.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )

        out_ref[i] = new_i
        out_ref[i - 1] = new_i1
        sel_ref[i - 1] = sel.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pt_swap_cascade(logl, origin, dbetas, shifts, raccept, interpret=False):
    """Run the full swap cascade in one kernel.

    Args:
        logl: ``(ntemps, nwalkers)`` float32 log-likelihoods.
        origin: ``(ntemps, nwalkers)`` float32 provenance values (carried
            alongside and swapped identically).
        dbetas: ``(ntemps - 1,)`` ``betas[i-1] - betas[i]`` per rung.
        shifts: ``(ntemps - 1,)`` int32 rotation offsets in ``[0, nwalkers)``.
        raccept: ``(ntemps - 1, nwalkers)`` log-uniform acceptance draws.

    Returns:
        ``(logl, origin, sel)`` with ``sel`` the ``(ntemps - 1, nwalkers)``
        accepted-swap mask (in rung-``i`` walker order).
    """
    ntemps, nwalkers = logl.shape
    dtype = logl.dtype
    data = jnp.stack([logl, origin], axis=1)  # (nt, 2, nw)

    kernel = functools.partial(_cascade_kernel, ntemps, nwalkers)
    out, sel = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ntemps, 2, nwalkers), dtype),
            jax.ShapeDtypeStruct((ntemps - 1, 1, nwalkers), dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        dbetas.reshape(ntemps - 1, 1).astype(dtype),
        shifts.reshape(ntemps - 1, 1).astype(jnp.int32),
        data,
        raccept.reshape(ntemps - 1, 1, nwalkers).astype(dtype),
    )
    return out[:, 0], out[:, 1], sel[:, 0]
