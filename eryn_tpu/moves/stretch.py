"""Goodman-Weare affine-invariant stretch move.

TPU-native re-design of ``/root/reference/src/eryn/moves/stretch.py:103-231``.
The proposal is one fused vector expression over the whole
``(ntemps, Ns, nleaves_max, ndim)`` block: a single ``z`` draw per walker
shared across branches, a random complement gather, a periodic-aware stretch,
and RJ-aware detailed-balance factors computed from the leaf-activation masks
instead of the reference's host-side bookkeeping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .red_blue import RedBlueMove

__all__ = ["StretchMove"]


class StretchMove(RedBlueMove):
    """Affine-invariant "stretch" proposal (Goodman & Weare 2010).

    ``z ~ ((a-1)u + 1)^2 / a``; proposal ``q = c + z (s - c)``; factors
    ``(ndim_active - 1) log z`` (ref ``stretch.py:128-132,223-229``).  Under
    reversible jump, ``ndim_active`` is the per-walker count of active
    parameters from the ``inds`` masks.
    """

    def __init__(self, a=2.0, return_gpu=False, random_seed=None, **kwargs):
        super().__init__(**kwargs)
        self.a = float(a)

    def adjust_factors(self, factors, ndims_old, ndims_new):
        """Gibbs dimension correction (ref ``stretch.py:55-72``):
        rescale ``log z`` terms from ``ndims_old - 1`` to ``ndims_new - 1``."""
        logzz = factors / (ndims_old - 1.0)
        return logzz * (ndims_new - 1.0)

    def choose_c_vals(self, key, c, ns):
        """Random complement pick per proposed walker
        (ref ``stretch.py:74-101``)."""
        ntemps, nc = c.shape[:2]
        rint = jax.random.randint(key, (ntemps, ns), 0, nc)
        return jnp.take_along_axis(c, rint[:, :, None, None], axis=1)

    def get_proposal_kernel(self, key, s_coords, c_coords, s_inds, param_masks=None):
        names = list(s_coords.keys())
        first = s_coords[names[0]]
        ntemps, ns = first.shape[:2]
        dtype = first.dtype

        key_z, *branch_keys = jax.random.split(key, 1 + len(names))

        # one z per walker, shared across branches (ref stretch.py:128-132)
        u = jax.random.uniform(key_z, (ntemps, ns), dtype=dtype)
        zz = ((self.a - 1.0) * u + 1.0) ** 2 / self.a

        newpos = {}
        ndim_active = jnp.zeros((ntemps, ns), dtype=dtype)
        for name, kb in zip(names, branch_keys):
            s = s_coords[name]
            c_temp = self.choose_c_vals(kb, c_coords[name], ns)

            if self.periodic is not None:
                diff = self.periodic.distance({name: s}, {name: c_temp})[name]
            else:
                diff = c_temp - s

            temp = c_temp - diff * zz[:, :, None, None]

            if self.periodic is not None:
                temp = self.periodic.wrap({name: temp})[name]

            newpos[name] = temp

            # RJ/Gibbs-aware dimension count: active leaves x selected params
            # (ref red_blue.py:199-207 + stretch.py:55-72)
            mask = None if param_masks is None else param_masks.get(name)
            if mask is None:
                ndim_active = (
                    ndim_active + s_inds[name].sum(axis=-1) * s.shape[-1]
                )
            else:
                mask = jnp.asarray(mask)
                per_leaf = mask.sum(axis=-1).astype(dtype)  # (nleaves_max,)
                ndim_active = ndim_active + (
                    s_inds[name] * per_leaf[None, None, :]
                ).sum(axis=-1)

        factors = (ndim_active - 1.0) * jnp.log(zz)
        return newpos, factors
