"""Red/blue half-ensemble proposal machinery.

TPU-native re-design of ``/root/reference/src/eryn/moves/red_blue.py:89-333``.
The reference shuffles walker indices on the host and loops over ragged
subsets with ``take_along_axis`` gathers; here one random permutation splits
the walker axis into ``nsplits`` *static-size* contiguous blocks, and each
block update is a fully vectorized gather -> propose -> accept -> scatter
inside the traced kernel.  The sequential dependency between halves (each
half's complement sees the other half's already-updated positions,
``red_blue.py:148-323``) is preserved by carrying the updated coordinate
arrays between block iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .move import Move, mh_accept
from .tempering import tempered_log_likelihood

__all__ = ["RedBlueMove"]


class RedBlueMove(Move):
    """Base for ensemble proposals that move one subset using the complement.

    Subclasses implement ``get_proposal_kernel(key, s_coords, c_coords,
    s_inds) -> (q_dict, factors)`` with ``factors`` shaped ``(ntemps, Ns)``.
    """

    def __init__(
        self,
        nsplits=2,
        randomize_split=True,
        live_dangerously=False,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.nsplits = int(nsplits)
        self.randomize_split = randomize_split
        self.live_dangerously = live_dangerously

    def setup(self, branches):
        """Per-proposal setup hook (ref ``red_blue.py:84-87``)."""
        pass

    def get_proposal_kernel(self, key, s_coords, c_coords, s_inds, param_masks=None):
        raise NotImplementedError

    def _propose_impl(self, key, state, ctx, kernel_state=()):
        ntemps, nwalkers = state.log_like.shape

        total_ndim = sum(
            state.branches[n].nleaves_max * state.branches[n].ndim
            for n in self.run_branches(state)
        )
        if nwalkers < 2 * total_ndim and not self.live_dangerously:
            raise RuntimeError(
                "It is unadvisable to use a red-blue move with fewer walkers "
                "than twice the number of dimensions. (set live_dangerously "
                "to override)"  # ref red_blue.py:102-114
            )

        self.setup(state.branches)

        coords = dict(state.branches_coords)
        inds = dict(state.branches_inds)
        logl = state.log_like
        logp = state.log_prior
        blobs = state.blobs
        betas = (
            state.betas
            if state.betas is not None
            else jnp.ones((ntemps,), dtype=logl.dtype)
        )
        accepted = jnp.zeros((ntemps, nwalkers), dtype=bool)

        # static subset sizes: the reference's shuffled `arange % nsplits`
        # (red_blue.py:119-124) yields these same counts.
        sizes = [
            nwalkers // self.nsplits + (1 if i < nwalkers % self.nsplits else 0)
            for i in range(self.nsplits)
        ]
        offsets = [sum(sizes[:i]) for i in range(self.nsplits)]

        for names, param_masks in self.gibbs_iterations_for(state):
            key, kperm = jax.random.split(key)
            if self.randomize_split:
                perm = jax.random.permutation(kperm, nwalkers)
            else:
                perm = jnp.arange(nwalkers)

            for split, (off, ns) in enumerate(zip(offsets, sizes)):
                sel = jax.lax.dynamic_slice_in_dim(perm, off, ns)
                comp = jnp.concatenate([perm[:off], perm[off + ns :]])

                s_coords = {n: coords[n][:, sel] for n in names}
                c_coords = {n: coords[n][:, comp] for n in names}
                s_inds = {n: inds[n][:, sel] for n in names}

                key, kprop, kacc = jax.random.split(key, 3)
                q, factors = self.get_proposal_kernel(
                    kprop, s_coords, c_coords, s_inds, param_masks
                )

                # gibbs parameter masking: non-selected (leaf, param) entries
                # keep old values (ref move.py:297-336)
                for n in names:
                    mask = param_masks.get(n)
                    if mask is not None:
                        mask_b = jnp.asarray(mask)[None, None, :, :]
                        q[n] = jnp.where(mask_b, q[n], s_coords[n])

                # evaluate over ALL branches: non-proposed branches contribute
                # their (unchanged) subset coords to the posterior
                q_eval = {
                    n: (q[n] if n in q else coords[n][:, sel]) for n in coords
                }
                inds_eval = {n: inds[n][:, sel] for n in inds}
                logp_new = ctx.compute_log_prior(q_eval, inds_eval)
                logl_new, blobs_new = ctx.compute_log_like(
                    q_eval, inds_eval, logp_new
                )

                prev_logl = logl[:, sel]
                prev_logp = logp[:, sel]
                logP_new = tempered_log_likelihood(logl_new, betas) + logp_new
                logP_old = tempered_log_likelihood(prev_logl, betas) + prev_logp

                acc = mh_accept(kacc, factors, logP_new, logP_old)

                acc4 = acc[:, :, None, None]
                for n in names:
                    coords[n] = coords[n].at[:, sel].set(
                        jnp.where(acc4, q[n], s_coords[n])
                    )
                logl = logl.at[:, sel].set(jnp.where(acc, logl_new, prev_logl))
                logp = logp.at[:, sel].set(jnp.where(acc, logp_new, prev_logp))
                if blobs is not None and blobs_new is not None:
                    acc_b = acc.reshape(acc.shape + (1,) * (blobs.ndim - 2))
                    blobs = blobs.at[:, sel].set(
                        jnp.where(acc_b, blobs_new, blobs[:, sel])
                    )
                accepted = accepted.at[:, sel].set(acc)

        new_state = state.replace(
            coords=coords, inds=inds, log_like=logl, log_prior=logp, blobs=blobs
        )
        return new_state, accepted, kernel_state
