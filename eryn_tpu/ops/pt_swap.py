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
    "pt_swap_cascade_multi",
    "proposals_per_rung",
    "ROLLED_THRESHOLD",
    "PAYLOAD_VMEM_BUDGET",
]

# above this walker count the O(nwalkers^2) one-hot rotation matrices no
# longer fit comfortably in VMEM and the lane-aligned rolled variant engages
ROLLED_THRESHOLD = 640

#: VMEM budget for the multi-channel (payload-carrying) cascade; beyond it
#: callers fall back to the provenance+gather formulation
PAYLOAD_VMEM_BUDGET = 8 * 2**20


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
    """Channel-agnostic cascade: rows are ``(C, nw)`` with channel 0 the
    log-likelihood; every other channel (provenance, or the full packed
    swap payload) is rotated/selected identically."""
    out_ref[:] = data_ref[:]
    ia = jax.lax.broadcasted_iota(jnp.int32, (nwalkers, nwalkers), 0)
    ib = jax.lax.broadcasted_iota(jnp.int32, (nwalkers, nwalkers), 1)
    diff = jnp.mod(ia - ib + nwalkers, nwalkers)
    for i in range(ntemps - 1, 0, -1):
        dbeta = dbetas_ref[i - 1, 0]
        s = shifts_ref[i - 1, 0]

        row_i = out_ref[i]  # (C, nw): [0] = logl
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
def pt_swap_cascade_multi(logl, channels, dbetas, shifts, raccept, interpret=False):
    """Run the full swap cascade in one kernel, carrying ``D`` payload
    channels through every rung.

    This is the zero-gather formulation: instead of cascading a provenance
    index and applying the composed permutation to the heavy state with a
    global row gather afterwards (latency-bound: ~27 ns/row regardless of
    row width, i.e. ~0.5 ms at 20x1000), the *packed state itself* rides
    the kernel's VMEM-resident channel block and moves via the same
    rotations/selects as the log-likelihood.

    Args:
        logl: ``(ntemps, nwalkers)`` float32 log-likelihoods.
        channels: ``(ntemps, D, nwalkers)`` float32 payload channels
            (flattened coords / masks / priors / blobs), swapped
            identically to ``logl``.
        dbetas: ``(ntemps - 1,)`` ``betas[i-1] - betas[i]`` per rung.
        shifts: ``(ntemps - 1,)`` int32 rotation offsets in ``[0, nwalkers)``.
        raccept: ``(ntemps - 1, nwalkers)`` log-uniform acceptance draws.

    Returns:
        ``(logl, channels, sel)`` with ``sel`` the ``(ntemps - 1, nwalkers)``
        accepted-swap mask (in rung-``i`` walker order).
    """
    ntemps, nwalkers = logl.shape
    dtype = logl.dtype
    D = channels.shape[1]
    if nwalkers > ROLLED_THRESHOLD:
        return _cascade_multi_rolled(
            logl, channels, dbetas, shifts, raccept, interpret=interpret
        )
    data = jnp.concatenate([logl[:, None], channels], axis=1)  # (nt, 1+D, nw)

    kernel = functools.partial(_cascade_kernel, ntemps, nwalkers)
    out, sel = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ntemps, 1 + D, nwalkers), dtype),
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
    return out[:, 0], out[:, 1:], sel[:, 0]


def pt_swap_cascade(logl, origin, dbetas, shifts, raccept, interpret=False):
    """Provenance-carrying cascade (see :func:`pt_swap_cascade_multi`): the
    original two-channel formulation, kept for payloads too large for VMEM
    (the caller applies the composed permutation with a gather)."""
    ntemps, nwalkers = logl.shape
    _check_provenance_capacity(ntemps, nwalkers)
    logl2, ch, sel = pt_swap_cascade_multi(
        logl, origin[:, None], dbetas, shifts, raccept, interpret=interpret
    )
    return logl2, ch[:, 0], sel


def pt_swap_cascade_rolled(logl, origin, dbetas, shifts, raccept, interpret=False):
    """Large-ensemble provenance cascade (rolled variant); see
    :func:`pt_swap_cascade_multi` for the pairing/thinning semantics."""
    ntemps, nwalkers = logl.shape
    _check_provenance_capacity(ntemps, nwalkers)
    logl2, ch, sel = _cascade_multi_rolled(
        logl, origin[:, None], dbetas, shifts, raccept, interpret=interpret
    )
    return logl2, ch[:, 0], sel


def _cascade_roll_kernel(ntemps, nwpad, dbetas_ref, shifts_ref, data_ref,
                         racc_ref, out_ref, sel_ref):
    """Rolled cascade, channel-agnostic: rows are ``(2+D, nwpad)`` with
    channel 0 the log-likelihood and channel 1 the pad-lane validity."""
    out_ref[:] = data_ref[:]
    for i in range(ntemps - 1, 0, -1):
        dbeta = dbetas_ref[i - 1, 0]
        s = shifts_ref[i - 1, 0]

        row_i = out_ref[i]  # (2+D, nwpad): [logl, valid, payload...]
        row_i1 = out_ref[i - 1]

        # rolled[w] = row_i1[(w + s) % nwpad] — lane-aligned dynamic rotate
        rolled = pltpu.roll(row_i1, nwpad - s, 1)

        pacc = dbeta * (row_i[0:1] - rolled[0:1])  # (1, nwpad)
        valid = (row_i[1:2] * rolled[1:2]) > 0.5
        sel = (pacc > racc_ref[i - 1]) & valid

        new_i = jnp.where(sel, rolled, row_i)
        new_i1_rolled = jnp.where(sel, row_i, rolled)
        new_i1 = pltpu.roll(new_i1_rolled, s, 1)

        out_ref[i] = new_i
        out_ref[i - 1] = new_i1
        sel_ref[i - 1] = sel.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cascade_multi_rolled(logl, channels, dbetas, shifts, raccept, interpret=False):
    """Large-ensemble multi-channel cascade: the walker axis is padded to a
    lane multiple and per-rung partner rotation uses the hardware
    dynamic-rotate (``pltpu.roll``) instead of one-hot matmuls.  A validity
    channel keeps pad lanes out of every swap; real walkers whose rotated
    partner lands on a pad lane simply skip that rung — a uniform,
    state-independent thinning of swap attempts of up to ``pad/nwpad``
    (~2% at nwalkers=1000 but ~15% just above the dispatch threshold, e.g.
    nwalkers=650).  Callers must therefore normalize acceptance ratios by
    the *actual* number of valid pairings per rung (see
    ``TemperatureControl._swap_kernel_pallas``), not by ``nwalkers``.
    """
    ntemps, nwalkers = logl.shape
    dtype = logl.dtype
    D = channels.shape[1]
    nwpad = -(-nwalkers // 128) * 128

    pad = nwpad - nwalkers
    valid = jnp.concatenate(
        [jnp.ones((ntemps, 1, nwalkers), dtype), jnp.zeros((ntemps, 1, pad), dtype)],
        axis=2,
    )
    logl_p = jnp.pad(logl, ((0, 0), (0, pad)))[:, None]
    chan_p = jnp.pad(channels, ((0, 0), (0, 0), (0, pad)))
    racc_p = jnp.pad(
        raccept, ((0, 0), (0, pad)), constant_values=jnp.inf
    ).reshape(ntemps - 1, 1, nwpad)
    data = jnp.concatenate([logl_p, valid, chan_p], axis=1)  # (nt, 2+D, nwpad)

    kernel = functools.partial(_cascade_roll_kernel, ntemps, nwpad)
    out, sel = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ntemps, 2 + D, nwpad), dtype),
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
        out[:, 2:, :nwalkers],
        sel[:, 0, :nwalkers],
    )
