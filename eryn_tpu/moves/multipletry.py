"""Multiple-try Metropolis machinery.

TPU-native re-design of
``/root/reference/src/eryn/moves/multipletry.py:25-776``.  The ``num_try``
axis is just one more batch dimension: candidate generation, importance
weighting (``logP - logq``), categorical selection, and the auxiliary
reference set for detailed balance are all fused vector math over
``(ntemps, nwalkers, num_try)``, with likelihood tries evaluated through the
same batched evaluator as the main ensemble (tries folded into the walker
axis).

Acceptance identity used throughout (matching the reference's ``factors``
construction, ``multipletry.py:455-476``): the final ``lnpdiff`` reduces to
``logsumexp(w_new) - logsumexp(w_aux)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .move import Move, mh_accept
from .tempering import tempered_log_likelihood

__all__ = ["MultipleTryMove", "get_mt_computations", "logsumexp"]


def logsumexp(a, axis=None):
    """Stable logsumexp (ref ``multipletry.py:25-33``)."""
    return jax.scipy.special.logsumexp(a, axis=axis)


def get_mt_computations(logP, log_proposal_pdf, symmetric=False, xp=None):
    """Importance weights + categorical try selection — the reference's
    public helper with its exact signature (ref ``multipletry.py:36-59``).

    ``(nbatch, num_try)`` inputs; draws selection uniforms through NumPy's
    global RNG like the reference (the compiled sampler path uses the keyed
    :meth:`MultipleTryMove.mt_select_kernel` instead).

    Returns:
        ``(log_importance_weights, log_sum_weights, inds_keep)``.
    """
    import numpy as np

    if xp is None:
        xp = np
    logP = xp.asarray(logP)
    if symmetric:
        log_importance_weights = logP
    else:
        log_importance_weights = logP - xp.asarray(log_proposal_pdf)
    max_w = xp.max(log_importance_weights, axis=-1)
    log_sum_weights = max_w + xp.log(
        xp.exp(log_importance_weights - max_w[:, None]).sum(axis=-1)
    )
    probs = xp.exp(log_importance_weights - log_sum_weights[:, None])
    u = xp.asarray(np.random.rand(probs.shape[0]))
    inds_keep = (probs.cumsum(1) > u[:, None]).argmax(1)
    return log_importance_weights, log_sum_weights, inds_keep


class MultipleTryMove(Move):
    """Generic multiple-try mixin (ref ``multipletry.py:62``).

    Subclasses provide:

    * ``special_generate_kernel(key, state, num_try) -> (tries, logq)`` with
      ``tries`` shaped ``(ntemps, nwalkers, num_try, ndim)`` and ``logq``
      ``(ntemps, nwalkers, num_try)`` — the proposal is anchored on
      ``state``'s current coordinates (ignored by state-independent
      generators);
    * ``special_generate_logpdf_kernel(state, coords=None) ->
      (ntemps, nwalkers)`` — the proposal logpdf of ``coords`` (default:
      ``state``'s current target coords) under the generator anchored on
      ``state``;
    * ``mt_eval_kernel(ctx, state, tries) -> (ll, lp)`` — likelihood/prior per
      try, each ``(ntemps, nwalkers, num_try)``;
    * for state-dependent generators with ``independent=False``,
      ``_with_target_coords(state, coords) -> state`` — a copy of ``state``
      whose target-branch coordinates are replaced by ``coords``
      ``(ntemps, nwalkers, ndim)`` (the auxiliary set must be anchored on
      the *chosen* point for detailed balance).

    Args:
        num_try: number of tries.
        independent: proposal independent of the current point.
        symmetric: symmetric proposal (importance weights are ``logP`` only).
    """

    def __init__(
        self, num_try=1, independent=False, symmetric=False, rj=False, **kwargs
    ):
        super().__init__(**kwargs)
        self.num_try = int(num_try)
        self.independent = independent
        self.symmetric = symmetric
        self.mt_rj = rj
        if rj and (symmetric or independent):
            raise ValueError(
                "If rj==True, symmetric and independent must both be False."
            )

    # -- subclass hooks -----------------------------------------------------
    def special_generate_kernel(self, key, state, num_try):
        raise NotImplementedError

    def special_generate_logpdf_kernel(self, state, coords=None):
        raise NotImplementedError

    def mt_eval_kernel(self, ctx, state, tries):
        raise NotImplementedError

    def _with_target_coords(self, state, coords):
        """Return ``state`` with the target branch's coordinates replaced by
        ``coords`` (used to anchor the auxiliary set on the chosen point).
        State-dependent generators with ``independent=False`` must override
        this; state-independent ones never need it."""
        raise NotImplementedError(
            "Non-independent multiple-try with a state-dependent generator "
            "requires _with_target_coords(state, coords) so the auxiliary "
            "set can be anchored on the chosen point."
        )

    def mt_select_kernel(self, key, state, ctx):
        """Run the full MT machinery for the in-model case.

        Returns ``(chosen coords (nt, nw, ndim), ll_out, lp_out, factors)``
        such that ``factors + logP_new - logP_old`` equals the MT weight-sum
        ratio.
        """
        ntemps, nwalkers = state.log_like.shape
        betas = (
            state.betas
            if state.betas is not None
            else jnp.ones((ntemps,), dtype=state.log_like.dtype)
        )
        key_gen, key_pick, key_aux = jax.random.split(key, 3)

        tries, logq = self.special_generate_kernel(key_gen, state, self.num_try)
        ll, lp = self.mt_eval_kernel(ctx, state, tries)
        logP = tempered_log_likelihood(ll, betas[:, None, None]) + lp

        logw = logP if self.symmetric else logP - logq
        log_sum_w = logsumexp(logw, axis=-1)

        # categorical selection over tries (ref multipletry.py:36-59)
        j = jax.random.categorical(key_pick, logw, axis=-1)
        one_hot = (
            jax.lax.broadcasted_iota(jnp.int32, logw.shape, 2) == j[:, :, None]
        )

        def pick(x):
            return jnp.sum(jnp.where(one_hot, x, 0.0), axis=-1)

        coords_out = jnp.sum(
            jnp.where(one_hot[..., None], tries, 0.0), axis=2
        )
        ll_out = pick(ll)
        lp_out = pick(lp)
        logP_out = pick(logP)

        # auxiliary reference set for detailed balance
        if self.independent:
            # replace the chosen slot with the current point
            # (ref multipletry.py:380-419)
            cur_logP = (
                tempered_log_likelihood(state.log_like, betas) + state.log_prior
            )
            if self.symmetric:
                aux_sub = cur_logP
            else:
                cur_logq = self.special_generate_logpdf_kernel(state)
                aux_sub = cur_logP - cur_logq
            aux_logw = jnp.where(one_hot, aux_sub[:, :, None], logw)
        else:
            # regenerate an auxiliary try set anchored on the CHOSEN point:
            # standard MTM draws the reference set from T(y, .) with y the
            # selected try (Liu, Liang & Wong 2000; ref multipletry.py:432-460)
            state_y = self._with_target_coords(state, coords_out)
            aux_tries, aux_logq = self.special_generate_kernel(
                key_aux, state_y, self.num_try
            )
            cur = self._current_target_coords(state)
            aux_tries = jnp.where(one_hot[..., None], cur[:, :, None, :], aux_tries)
            if not self.symmetric:
                # The chosen slot now holds the *current* point x, so its
                # importance weight must use T(y -> x) — the proposal logpdf
                # of the current point under the chosen-point anchor — not
                # the logpdf of the discarded random draw (the reference
                # computes the generate logpdf after filling the slot,
                # ref mtdistgen.py special_generate_func).
                cur_logq = self.special_generate_logpdf_kernel(
                    state_y, coords=cur
                )
                aux_logq = jnp.where(one_hot, cur_logq[:, :, None], aux_logq)
            aux_ll, aux_lp = self.mt_eval_kernel(ctx, state, aux_tries)
            aux_logP = tempered_log_likelihood(aux_ll, betas[:, None, None]) + aux_lp
            aux_logw = aux_logP if self.symmetric else aux_logP - aux_logq
            cur_logP = (
                tempered_log_likelihood(state.log_like, betas) + state.log_prior
            )

        aux_log_sum_w = logsumexp(aux_logw, axis=-1)

        # factors such that factors + logP_new - logP_old = log_sum_w -
        # aux_log_sum_w (ref multipletry.py:466-476)
        factors = (cur_logP - aux_log_sum_w) - (logP_out - log_sum_w)
        return coords_out, ll_out, lp_out, factors

    def _current_target_coords(self, state):
        raise NotImplementedError


class MultipleTryMoveRJ(MultipleTryMove):
    """Generic nested-RJ multiple-try mixin (ref ``multipletry.py:597-776``);
    see :class:`~eryn_tpu.moves.mtdistgenrj.MTDistGenMoveRJ` for the concrete
    distribution-draw implementation."""

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("rj", True)
        super().__init__(*args, **kwargs)

    def mt_select_kernel(self, key, state, ctx):
        # the in-model machinery below has no RJ branch (no death-try
        # inversion, no one-less-leaf auxiliary base); using it for
        # trans-dimensional proposals would be silently wrong
        raise NotImplementedError(
            "MultipleTryMoveRJ's trans-dimensional factor bookkeeping lives "
            "in MTDistGenMoveRJ (death-try inversion + RJ auxiliary sets); "
            "subclass MTDistGenMoveRJ or adapt its _propose_impl rather "
            "than calling the in-model mt_select_kernel."
        )
