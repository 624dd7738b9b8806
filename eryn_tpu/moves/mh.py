"""Whole-ensemble Metropolis-Hastings skeleton.

TPU-native re-design of ``/root/reference/src/eryn/moves/mh.py:16-193``: the
proposal, prior, likelihood, and accept/merge all operate on the full
``(ntemps, nwalkers)`` block in one traced pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .move import Move, mh_accept, state_branch_supps
from .tempering import tempered_log_likelihood

__all__ = ["MHMove"]


class MHMove(Move):
    """Base for moves proposing updates for all walkers at once.

    Subclasses implement ``get_proposal_kernel(key, branch_coords,
    branch_inds, kernel_state) -> (q_dict, factors, kernel_state)`` with
    ``factors`` shaped ``(ntemps, nwalkers)``.
    """

    def get_proposal_kernel(self, key, branch_coords, branch_inds, kernel_state):
        raise NotImplementedError

    def _propose_impl(self, key, state, ctx, kernel_state=()):
        coords = dict(state.branches_coords)
        inds = dict(state.branches_inds)
        ntemps, nwalkers = state.log_like.shape
        betas = (
            state.betas
            if state.betas is not None
            else jnp.ones((ntemps,), dtype=state.log_like.dtype)
        )
        logl = state.log_like
        logp = state.log_prior
        blobs = state.blobs
        accepted = jnp.zeros((ntemps, nwalkers), dtype=bool)

        for names, param_masks in self.gibbs_iterations_for(state):
            key, kprop, kacc = jax.random.split(key, 3)
            q, factors, kernel_state = self.get_proposal_kernel(
                kprop,
                {n: coords[n] for n in names},
                {n: inds[n] for n in names},
                kernel_state,
            )

            # gibbs parameter masking (ref move.py:297-336)
            for n in names:
                mask = param_masks.get(n)
                if mask is not None:
                    mask_b = jnp.asarray(mask)[None, None, :, :]
                    q[n] = jnp.where(mask_b, q[n], coords[n])

            q_full = {**coords, **q}
            logp_new = ctx.compute_log_prior(q_full, inds)
            logl_new, blobs_new = ctx.compute_log_like(
                q_full, inds, logp_new, state_branch_supps(state)
            )

            logP_new = tempered_log_likelihood(logl_new, betas) + logp_new
            logP_old = tempered_log_likelihood(logl, betas) + logp
            acc = mh_accept(kacc, factors, logP_new, logP_old)

            acc4 = acc[:, :, None, None]
            for n in names:
                coords[n] = jnp.where(acc4, q_full[n], coords[n])
            logl = jnp.where(acc, logl_new, logl)
            logp = jnp.where(acc, logp_new, logp)
            if blobs is not None and blobs_new is not None:
                acc_b = acc.reshape(acc.shape + (1,) * (blobs.ndim - 2))
                blobs = jnp.where(acc_b, blobs_new, blobs)
            accepted = accepted | acc

        new_state = state.replace(
            coords=coords, inds=inds, log_like=logl, log_prior=logp, blobs=blobs
        )
        return new_state, accepted, kernel_state
