"""Delayed-rejection MH (experimental, as in the reference).

TPU-native re-design of
``/root/reference/src/eryn/moves/delayedrejection.py:40-229``.  NOTE: the
reference ships this move but keeps it unreachable from the RJ path
(``rj.py:350-353`` raises NotImplementedError); this implementation follows
the *intended* semantics — the iterated DR chain of Trias et al.
(arXiv:0904.2207) with the one-step-back alpha correction
(``delayedrejection.py:100-117``) — as a usable in-model move, and is flagged
experimental to match.

Each DR stage re-proposes from the previously rejected candidate with the
wrapped (symmetric) proposal; the stage-k acceptance is the exact recursive
Mira (2001) formula

    alpha_m(z_0..z_m) = min(1, pi(z_m)/pi(z_0)
        * prod_j (1 - alpha_j(z_m..z_{m-j})) / prod_j (1 - alpha_j(z_0..z_j)))

computed over all contiguous sub-paths of the candidate chain (O(max_iter^3)
elementwise ops, unrolled in the traced kernel).  NOTE: the reference's
in-tree formula uses ``pi(y_k)/pi(y_{k-1})`` in place of ``pi(y_k)/pi(x)``,
which does not leave the target invariant — verified empirically (the
reference also never reaches this code path, ``rj.py:350-353``); this
implementation uses the correct kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .move import Move
from .tempering import tempered_log_likelihood

__all__ = ["DelayedRejection", "DelayedRejectionContainer"]


class DelayedRejectionContainer:
    """Config carrier matching the reference's container API
    (ref ``delayedrejection.py``)."""

    def __init__(self, proposal=None, max_iter=10):
        self.proposal = proposal
        self.max_iter = max_iter


class DelayedRejection(Move):
    """Delayed-rejection wrapper around an MH-style proposal
    (ref ``delayedrejection.py:40``).

    Args:
        proposal: a move exposing ``get_proposal_kernel(key, coords, inds,
            kernel_state) -> (q, factors, kernel_state)`` whose proposal is
            SYMMETRIC per stage (``q(x -> y) == q(y -> x)``), e.g.
            :class:`~eryn_tpu.moves.gaussian.GaussianMove`.  The recursive
            acceptance below drops all proposal densities, which is exact
            only in the symmetric case — the move refuses asymmetric
            proposals (wrapped ``factors`` are not representable in the
            multi-stage recursion).  Custom moves opt in by setting a class
            attribute ``symmetric_proposal = True``.
        max_iter: number of delayed-rejection stages after the first
            rejection.  COST NOTE: the traced kernel evaluates ALL
            ``max_iter + 1`` candidates unconditionally every proposal (no
            data-dependent early exit under ``jit``), so the move costs
            ``max_iter + 1`` full likelihood evaluations per step; the
            default is kept small for that reason (the reference's lazy
            host loop defaults to 10 but is unreachable, ``rj.py:350-353``).
    """

    def __init__(self, proposal, max_iter=3, **kwargs):
        super().__init__(**kwargs)
        if not getattr(proposal, "symmetric_proposal", False):
            raise ValueError(
                "DelayedRejection requires a symmetric wrapped proposal "
                "(its recursive acceptance drops all proposal densities). "
                f"{type(proposal).__name__} does not declare "
                "symmetric_proposal = True; use GaussianMove, or set the "
                "attribute on a custom move whose kernel is symmetric."
            )
        self.proposal = proposal
        self.max_iter = int(max_iter)

    def propagate_wiring(self):
        if self.proposal.periodic is None:
            self.proposal.periodic = self.periodic
        if self.proposal.temperature_control is None:
            self.proposal.temperature_control = self.temperature_control

    def init_kernel_state(self, state):
        return self.proposal.init_kernel_state(state)

    def _eval_candidate(self, ctx, state, q, betas):
        inds = dict(state.branches_inds)
        logp = ctx.compute_log_prior(q, inds)
        logl, blobs = ctx.compute_log_like(q, inds, logp)
        logP = tempered_log_likelihood(logl, betas) + logp
        return logl, logp, logP, blobs

    def _propose_impl(self, key, state, ctx, kernel_state=()):
        self.propagate_wiring()
        coords = dict(state.branches_coords)
        inds = dict(state.branches_inds)
        ntemps, nwalkers = state.log_like.shape
        betas = (
            state.betas
            if state.betas is not None
            else jnp.ones((ntemps,), dtype=state.log_like.dtype)
        )
        names = self.proposal.run_branches(state)

        logl = state.log_like
        logp = state.log_prior
        blobs = state.blobs
        logP_x = tempered_log_likelihood(logl, betas) + logp

        def merge(accepted_now, q_cand, ll_cand, lp_cand, blobs_cand):
            nonlocal coords, logl, logp, blobs
            acc4 = accepted_now[:, :, None, None]
            for n in names:
                coords[n] = jnp.where(acc4, q_cand[n], coords[n])
            logl = jnp.where(accepted_now, ll_cand, logl)
            logp = jnp.where(accepted_now, lp_cand, logp)
            if blobs is not None and blobs_cand is not None:
                acc_b = accepted_now.reshape(
                    accepted_now.shape + (1,) * (blobs.ndim - 2)
                )
                blobs = jnp.where(acc_b, blobs_cand, blobs)

        # build the candidate chain x -> y1 -> ... -> yK, evaluating each
        # candidate once; acceptance uses the recursive Mira alphas below
        chain_logP = [logP_x]
        chain_vals = []  # (q_full, ll, lp) per candidate
        prev_q = coords
        for _stage in range(self.max_iter + 1):
            key, kq = jax.random.split(key)
            q, _factors, kernel_state = self.proposal.get_proposal_kernel(
                kq,
                {n: prev_q[n] for n in names},
                {n: inds[n] for n in names},
                kernel_state,
            )
            q_full = {**prev_q, **q}
            ll_c, lp_c, logP_c, blobs_c = self._eval_candidate(
                ctx, state, q_full, betas
            )
            chain_logP.append(logP_c)
            chain_vals.append((q_full, ll_c, lp_c, blobs_c))
            prev_q = q_full

        # alpha[(s, e)] = acceptance of contiguous sub-path z_s -> z_e
        # (symmetric proposal assumed; exact Mira 2001 recursion)
        alpha_cache = {}

        def alpha(s, e):
            if (s, e) in alpha_cache:
                return alpha_cache[(s, e)]
            m = abs(e - s)
            ld = chain_logP[e] - chain_logP[s]
            if m == 1:
                out = jnp.exp(jnp.minimum(ld, 0.0))
            else:
                step_f = 1 if e > s else -1
                log_num = jnp.zeros_like(ld)
                log_den = jnp.zeros_like(ld)
                for j in range(1, m):
                    log_num = log_num + jnp.log1p(-alpha(e, e - step_f * j))
                    log_den = log_den + jnp.log1p(-alpha(s, s + step_f * j))
                out = jnp.exp(jnp.minimum(ld + log_num - log_den, 0.0))
            out = jnp.nan_to_num(out)  # NaNs auto-reject (ref dr.py:112)
            alpha_cache[(s, e)] = out
            return out

        accepted = jnp.zeros(logP_x.shape, dtype=bool)
        for stage in range(1, self.max_iter + 2):
            key, ku = jax.random.split(key)
            a = alpha(0, stage)
            u = jax.random.uniform(ku, a.shape, dtype=a.dtype)
            q_full, ll_c, lp_c, blobs_c = chain_vals[stage - 1]
            acc_now = (~accepted) & (u < a)
            merge(acc_now, q_full, ll_c, lp_c, blobs_c)
            accepted = accepted | acc_now

        new_state = state.replace(
            coords=coords, inds=inds, log_like=logl, log_prior=logp,
            blobs=blobs,
        )
        return new_state, accepted, kernel_state
