"""Reversible-jump birth/death from a generating distribution.

TPU-native re-design of ``/root/reference/src/eryn/moves/distgenrj.py:14-222``:
birth coordinates are keyed draws from the branch's distribution (usually the
prior), deaths flip the mask, and detailed-balance factors are
``-logpdf(born)`` / ``+logpdf(removed)`` (``distgenrj.py:196-221``) — all as
one fused masked kernel instead of per-walker Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rj import ReversibleJumpMove, rj_change_kernel
from ..prior import ProbDistContainer

__all__ = ["DistributionGenerateRJ"]


class DistributionGenerateRJ(ReversibleJumpMove):
    """Concrete RJ birth/death move (ref ``distgenrj.py:14``).

    Args:
        generate_dist: ``{branch_name: ProbDistContainer}`` to draw births
            from (typically the priors).
        nleaves_max / nleaves_min: per-branch leaf-count bounds.
        fix_change: force +1 (birth-only) or -1 (death-only) proposals.
    """

    def __init__(self, generate_dist, *args, **kwargs):
        if isinstance(generate_dist, ProbDistContainer):
            generate_dist = {"model_0": generate_dist}
        self.generate_dist = generate_dist
        super().__init__(*args, **kwargs)

    def run_branches(self, state):
        names = super().run_branches(state)
        return [n for n in names if n in self.generate_dist]

    def get_proposal_kernel(self, key, name, coords, inds):
        ntemps, nwalkers, nleaves_max, ndim = coords.shape
        dist = self.generate_dist[name]

        k_change, k_draw = jax.random.split(key)
        change, slot, new_inds = rj_change_kernel(
            k_change,
            inds,
            self.nleaves_min[name],
            self.nleaves_max[name],
            self.fix_change,
        )

        # birth draws for every walker (only used where change == +1)
        draw = dist.sample(k_draw, (ntemps, nwalkers)).astype(coords.dtype)

        slot_mask = (
            jax.lax.broadcasted_iota(jnp.int32, inds.shape, 2)
            == slot[:, :, None]
        )
        born = (change == 1)[:, :, None] & slot_mask
        q = jnp.where(born[..., None], draw[:, :, None, :], coords)

        # coords at the affected slot (old values — the removed leaf)
        at_slot = jnp.take_along_axis(
            coords, slot[:, :, None, None].astype(jnp.int32), axis=2
        )[:, :, 0, :]

        # factors (ref distgenrj.py:196-221): birth -> -logpdf(new);
        # death -> +logpdf(removed)
        lq_draw = dist.logpdf(draw)
        lq_removed = dist.logpdf(at_slot)
        factors = jnp.where(
            change == 1,
            -lq_draw,
            jnp.where(change == -1, lq_removed, 0.0),
        ).astype(coords.dtype)

        return q, new_inds, factors
