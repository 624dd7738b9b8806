"""Fused pallas kernels for the stretch-move hot path.

Two kernels bracket the (XLA) likelihood evaluation of each red/blue half:

* :func:`stretch_propose` — z-draw, complement pick (one-hot matmul), and the
  affine stretch, emitting proposed coordinates + detailed-balance factors in
  one launch;
* :func:`stretch_accept` — tempered Metropolis-Hastings acceptance and the
  conditional merge of coords/logl/logp in one launch.

Engaged by :class:`~eryn_tpu.moves.stretch.StretchMove` on TPU when there are
no periodic parameters and no Gibbs parameter masks; the general XLA path
remains for every other case.  Branch coordinate blocks are concatenated
along the trailing axis, so one launch covers all branches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stretch_propose", "stretch_accept"]


def _propose_kernel(a, log_proposal, s_ref, c_ref, ndim_ref, u_ref, q_ref, fac_ref):
    # per-temperature block: s (1, ns, D), c (1, nc, D), ndim (1, ns),
    # u (2, 1, ns) — the grid runs one program per temperature so the
    # one-hot pick matrix is only (ns, nc)
    # blocks: s (1, ns, D), c (1, nc, D), ndim (1, 1, ns), u (2, 1, 1, ns)
    ns = s_ref.shape[1]
    nc = c_ref.shape[1]
    dtype = s_ref.dtype

    u_z = u_ref[0, 0, 0]  # (ns,)
    u_pick = u_ref[1, 0, 0]
    if log_proposal:
        # ptemcee scaling density g(z) ∝ 1/z: ln z ~ U[-ln a, ln a]
        zz = jnp.exp((2.0 * u_z - 1.0) * jnp.log(a))  # (ns,)
    else:
        zz = ((a - 1.0) * u_z + 1.0) ** 2 / a  # (ns,)

    # complement pick as a one-hot matmul: rint in [0, nc)
    rint = jnp.floor(u_pick * nc).astype(jnp.int32)
    pick = (
        jax.lax.broadcasted_iota(jnp.int32, (ns, nc), 1) == rint[:, None]
    ).astype(dtype)
    c_temp = jnp.dot(
        pick,
        c_ref[0],
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # (ns, D)

    s = s_ref[0]
    q_ref[0] = c_temp - (c_temp - s) * zz[:, None]
    # detailed-balance exponent: N-1 for the GW density, N for g ∝ 1/z
    exponent = ndim_ref[0, 0] - (0.0 if log_proposal else 1.0)
    fac_ref[0, 0] = exponent * jnp.log(zz)


@functools.partial(
    jax.jit, static_argnames=("a", "interpret", "log_proposal")
)
def stretch_propose(s, c, ndim_act, u, a=2.0, interpret=False, log_proposal=False):
    """One launch, gridded over temperatures.

    Args:
        s: ``(nt, ns, D)`` coordinates being moved (branches concatenated).
        c: ``(nt, nc, D)`` complement coordinates.
        ndim_act: ``(nt, ns)`` active dimensionality per walker.
        u: ``(2, nt, ns)`` uniforms (z-draw, complement pick).
        a: stretch scale.

    Returns:
        ``(q (nt, ns, D), factors (nt, ns))``.
    """
    nt, ns, D = s.shape
    nc = c.shape[1]
    dtype = s.dtype
    kernel = functools.partial(_propose_kernel, float(a), bool(log_proposal))
    q, fac = pl.pallas_call(
        kernel,
        grid=(nt,),
        out_shape=(
            jax.ShapeDtypeStruct((nt, ns, D), dtype),
            jax.ShapeDtypeStruct((nt, 1, ns), dtype),
        ),
        in_specs=[
            pl.BlockSpec((1, ns, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, ns), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (2, 1, 1, ns), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, ns, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, ns), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(
        s,
        c,
        ndim_act.astype(dtype).reshape(nt, 1, ns),
        u.astype(dtype).reshape(2, nt, 1, ns),
    )
    return q, fac.reshape(nt, ns)


def _accept_kernel(
    q_ref,
    s_ref,
    ll_new_ref,
    lp_new_ref,
    ll_old_ref,
    lp_old_ref,
    fac_ref,
    betas_ref,
    u_ref,
    out_coords_ref,
    out_ll_ref,
    out_lp_ref,
    acc_ref,
):
    betas = betas_ref[:]  # (nt, 1)
    ll_new = ll_new_ref[:]
    ll_old = ll_old_ref[:]
    tl_new = ll_new * betas
    tl_old = ll_old * betas
    # beta == 0 singularity guard (ptemcee): NaN -> -inf
    tl_new = jnp.where(jnp.isnan(tl_new), -jnp.inf, tl_new)
    tl_old = jnp.where(jnp.isnan(tl_old), -jnp.inf, tl_old)
    lnpdiff = fac_ref[:] + (tl_new + lp_new_ref[:]) - (tl_old + lp_old_ref[:])
    # keep the decision variable in float; Mosaic cannot reshape i1 masks
    d = lnpdiff - jnp.log(u_ref[:])  # (nt, ns); NaN never accepts
    d = jnp.where(jnp.isnan(d), -jnp.inf, d)
    acc = d > 0.0

    out_coords_ref[:] = jnp.where(d[:, :, None] > 0.0, q_ref[:], s_ref[:])
    out_ll_ref[:] = jnp.where(acc, ll_new, ll_old)
    out_lp_ref[:] = jnp.where(acc, lp_new_ref[:], lp_old_ref[:])
    acc_ref[:] = acc.astype(out_ll_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def stretch_accept(
    q, s, ll_new, lp_new, ll_old, lp_old, factors, betas, u, interpret=False
):
    """One-launch tempered MH accept + merge for a half block.

    Returns ``(coords, logl, logp, accepted)`` for the block.
    """
    nt, ns, D = q.shape
    dtype = q.dtype
    return pl.pallas_call(
        _accept_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nt, ns, D), dtype),
            jax.ShapeDtypeStruct((nt, ns), dtype),
            jax.ShapeDtypeStruct((nt, ns), dtype),
            jax.ShapeDtypeStruct((nt, ns), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)
        ),
        interpret=interpret,
    )(
        q,
        s,
        ll_new.astype(dtype),
        lp_new.astype(dtype),
        ll_old.astype(dtype),
        lp_old.astype(dtype),
        factors.astype(dtype),
        betas.reshape(nt, 1).astype(dtype),
        u.astype(dtype),
    )
