"""Multiple-try MH from a generating distribution.

TPU-native re-design of ``/root/reference/src/eryn/moves/mtdistgen.py:7-137``:
``num_try`` candidate parameter vectors per walker are drawn from the given
distribution, evaluated in one batched likelihood call (tries folded into the
walker axis), importance-selected, and accepted against the auxiliary set.
Targets a single branch with ``nleaves_max == 1`` (as the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .move import mh_accept
from .multipletry import MultipleTryMove
from .tempering import tempered_log_likelihood
from ..prior import ProbDistContainer

__all__ = ["MTDistGenMove"]


class MTDistGenMove(MultipleTryMove):
    """MT-MH draw from ``generate_dist`` (ref ``mtdistgen.py:7``)."""

    def __init__(self, generate_dist, **kwargs):
        if isinstance(generate_dist, ProbDistContainer):
            generate_dist = {"model_0": generate_dist}
        self.generate_dist_all = generate_dist
        self.key_in = list(generate_dist.keys())[0]
        self.generate_dist = generate_dist[self.key_in]
        super().__init__(**kwargs)

    # -- MT hooks ------------------------------------------------------------
    def special_generate_kernel(self, key, state, num_try):
        ntemps, nwalkers = state.log_like.shape
        tries = self.generate_dist.sample(key, (ntemps, nwalkers, num_try))
        tries = tries.astype(state.branches[self.key_in].coords.dtype)
        logq = self.generate_dist.logpdf(tries)
        return tries, logq

    def special_generate_logpdf_kernel(self, state, coords=None):
        if coords is None:
            coords = state.branches[self.key_in].coords[:, :, 0]
        return self.generate_dist.logpdf(coords)

    def _current_target_coords(self, state):
        return state.branches[self.key_in].coords[:, :, 0]

    def _with_target_coords(self, state, coords):
        # the generating distribution ignores the current position, so
        # anchoring on the chosen point is a coordinate swap with no effect
        # on the generator; implemented for contract completeness
        new_coords = dict(state.branches_coords)
        new_coords[self.key_in] = coords[:, :, None, :]
        return state.replace(
            coords=new_coords, inds=dict(state.branches_inds)
        )

    def mt_eval_kernel(self, ctx, state, tries):
        ntemps, nwalkers, num_try, ndim = tries.shape
        coords = {
            self.key_in: tries.reshape(ntemps, nwalkers * num_try, 1, ndim)
        }
        inds = {
            self.key_in: jnp.repeat(
                state.branches[self.key_in].inds, num_try, axis=1
            )
        }
        for name, b in state.branches.items():
            if name == self.key_in:
                continue
            coords[name] = jnp.repeat(b.coords, num_try, axis=1)
            inds[name] = jnp.repeat(b.inds, num_try, axis=1)
        lp = ctx.compute_log_prior(coords, inds)
        ll, _ = ctx.compute_log_like(coords, inds, lp)
        return (
            ll.reshape(ntemps, nwalkers, num_try),
            lp.reshape(ntemps, nwalkers, num_try),
        )

    # -- proposal -------------------------------------------------------------
    def _propose_impl(self, key, state, ctx, kernel_state=()):
        ntemps, nwalkers = state.log_like.shape
        betas = (
            state.betas
            if state.betas is not None
            else jnp.ones((ntemps,), dtype=state.log_like.dtype)
        )
        key, k_mt, k_acc = jax.random.split(key, 3)
        coords_out, ll_out, lp_out, factors = self.mt_select_kernel(
            k_mt, state, ctx
        )

        logP_new = tempered_log_likelihood(ll_out, betas) + lp_out
        logP_old = (
            tempered_log_likelihood(state.log_like, betas) + state.log_prior
        )
        acc = mh_accept(k_acc, factors, logP_new, logP_old)

        coords = dict(state.branches_coords)
        old = coords[self.key_in]
        coords[self.key_in] = jnp.where(
            acc[:, :, None, None], coords_out[:, :, None, :], old
        )
        logl = jnp.where(acc, ll_out, state.log_like)
        logp = jnp.where(acc, lp_out, state.log_prior)

        new_state = state.replace(
            coords=coords,
            inds=dict(state.branches_inds),
            log_like=logl,
            log_prior=logp,
        )
        return new_state, acc, kernel_state
