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

__all__ = [
    "pt_swap_cascade",
    "pt_swap_cascade_rolled",
    "proposals_per_rung",
    "ROLLED_THRESHOLD",
]

# above this walker count the O(nwalkers^2) one-hot rotation matrices no
# longer fit comfortably in VMEM and the lane-aligned rolled variant engages
ROLLED_THRESHOLD = 640


def _check_provenance_capacity(ntemps, nwalkers):
    # provenance indices ride the f32 data channel and are exact only up to
    # 2^24; beyond that the final gather would silently corrupt the ensemble
    if ntemps * nwalkers >= 2**24:
        raise ValueError(
            f"pt_swap cascade provenance is carried in float32 and supports "
            f"at most 2**24 - 1 ensemble slots; got ntemps*nwalkers = "
            f"{ntemps * nwalkers}."
        )


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


def proposals_per_rung(nwalkers, shifts, dtype):
    """Actual number of proposed pairings per rung for the cascade that
    :func:`pt_swap_cascade` dispatches to at this ``nwalkers``.

    The rolled variant pads the walker axis to a lane multiple and skips
    pairs whose rotated partner lands on a pad lane, so the count depends on
    the per-rung shift; the one-hot variant proposes every walker.  Keeping
    this rule HERE (next to the kernels) means the dispatch condition and
    the pad arithmetic cannot silently desync from callers' normalization.
    """
    ntemps_m1 = shifts.shape[0]
    if nwalkers <= ROLLED_THRESHOLD:
        return jnp.full((ntemps_m1,), nwalkers, dtype=dtype)
    nwpad = -(-nwalkers // 128) * 128
    w = jnp.arange(nwalkers)
    partner = (w[None, :] + shifts[:, None]) % nwpad
    return (partner < nwalkers).sum(axis=-1).astype(dtype)


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
    _check_provenance_capacity(ntemps, nwalkers)
    dtype = logl.dtype
    if nwalkers > ROLLED_THRESHOLD:
        # the in-kernel one-hot rotation matrices are O(nwalkers^2) VMEM;
        # large ensembles use the lane-aligned rolled variant instead
        return pt_swap_cascade_rolled(
            logl, origin, dbetas, shifts, raccept, interpret=interpret
        )
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


def _cascade_roll_kernel(ntemps, nwpad, dbetas_ref, shifts_ref, data_ref,
                         racc_ref, out_ref, sel_ref):
    out_ref[:] = data_ref[:]
    for i in range(ntemps - 1, 0, -1):
        dbeta = dbetas_ref[i - 1, 0]
        s = shifts_ref[i - 1, 0]

        row_i = out_ref[i]  # (3, nwpad): [logl, provenance, valid]
        row_i1 = out_ref[i - 1]

        # rolled[w] = row_i1[(w + s) % nwpad] — lane-aligned dynamic rotate
        rolled = pltpu.roll(row_i1, nwpad - s, 1)

        pacc = dbeta * (row_i[0:1] - rolled[0:1])  # (1, nwpad)
        valid = (row_i[2:3] * rolled[2:3]) > 0.5
        sel = (pacc > racc_ref[i - 1]) & valid

        new_i = jnp.where(sel, rolled, row_i)
        new_i1_rolled = jnp.where(sel, row_i, rolled)
        new_i1 = pltpu.roll(new_i1_rolled, s, 1)

        out_ref[i] = new_i
        out_ref[i - 1] = new_i1
        sel_ref[i - 1] = sel.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pt_swap_cascade_rolled(logl, origin, dbetas, shifts, raccept, interpret=False):
    """Large-ensemble cascade variant: the walker axis is padded to a lane
    multiple and per-rung partner rotation uses the hardware dynamic-rotate
    (``pltpu.roll``) instead of one-hot matmuls.  A validity channel keeps
    pad lanes out of every swap; real walkers whose rotated partner lands on
    a pad lane simply skip that rung — a uniform, state-independent thinning
    of swap attempts of up to ``pad/nwpad`` (~2% at nwalkers=1000 but ~15%
    just above the dispatch threshold, e.g. nwalkers=650).  Callers must
    therefore normalize acceptance ratios by the *actual* number of valid
    pairings per rung (see ``TemperatureControl._swap_kernel_pallas``), not
    by ``nwalkers``.
    """
    ntemps, nwalkers = logl.shape
    _check_provenance_capacity(ntemps, nwalkers)
    dtype = logl.dtype
    nwpad = -(-nwalkers // 128) * 128

    pad = nwpad - nwalkers
    valid = jnp.concatenate(
        [jnp.ones((ntemps, nwalkers), dtype), jnp.zeros((ntemps, pad), dtype)],
        axis=1,
    )
    logl_p = jnp.pad(logl, ((0, 0), (0, pad)))
    origin_p = jnp.pad(origin, ((0, 0), (0, pad)))
    racc_p = jnp.pad(
        raccept, ((0, 0), (0, pad)), constant_values=jnp.inf
    ).reshape(ntemps - 1, 1, nwpad)
    data = jnp.stack([logl_p, origin_p, valid], axis=1)  # (nt, 3, nwpad)

    kernel = functools.partial(_cascade_roll_kernel, ntemps, nwpad)
    out, sel = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ntemps, 3, nwpad), dtype),
            jax.ShapeDtypeStruct((ntemps - 1, 1, nwpad), dtype),
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
        racc_p.astype(dtype),
    )
    return (
        out[:, 0, :nwalkers],
        out[:, 1, :nwalkers],
        sel[:, 0, :nwalkers],
    )
