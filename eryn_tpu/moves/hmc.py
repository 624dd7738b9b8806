"""Hamiltonian Monte Carlo move — a TPU-native extension.

No reference equivalent (see :mod:`eryn_tpu.moves.mala`): the leapfrog
integrator differentiates the tempered log-posterior through the user's
traced likelihood with ``jax.grad``, unrolled by ``lax.scan`` inside the
compiled sampler step.  Momenta exist only on active RJ leaves, so the move
is reversible-jump compatible.

Acceptance is the standard Metropolis correction on the Hamiltonian error:

    H(x, p) = -logP(x) + ||p||^2 / 2
    accept with prob min(1, exp(H(x0, p0) - H(x1, p1)))

which maps onto the sampler's ``factors + logP_new - logP_old`` contract
with ``factors = (||p0||^2 - ||p1||^2) / 2``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mala import MALAMove
from .move import mh_accept, state_branch_supps
from .tempering import tempered_log_likelihood

__all__ = ["HMCMove"]


class HMCMove(MALAMove):
    """Leapfrog HMC proposal.

    Args:
        eps: leapfrog step size — scalar or ``{branch: scalar or (ndim,)
            array}`` (per-parameter mass preconditioning).
        num_leapfrog: number of leapfrog steps per proposal.
        target_acceptance / tune_steps: dual-averaging step-size adaptation
            (inherited from :class:`~eryn_tpu.moves.mala.MALAMove`; 0.65 is
            the HMC-optimal acceptance).
    """

    def __init__(
        self,
        eps=0.1,
        num_leapfrog=5,
        target_acceptance=0.65,
        tune_steps=0,
        **kwargs,
    ):
        super().__init__(
            eps=eps,
            target_acceptance=target_acceptance,
            tune_steps=tune_steps,
            **kwargs,
        )
        self.num_leapfrog = int(num_leapfrog)

    def _propose_impl(self, key, state, ctx, kernel_state=()):
        names = self.run_branches(state)
        coords = {n: state.branches_coords[n] for n in names}
        inds = dict(state.branches_inds)
        other = {
            n: state.branches_coords[n]
            for n in state.branches_coords
            if n not in names
        }
        ntemps, nwalkers = state.log_like.shape
        dtype = state.log_like.dtype
        betas = (
            state.betas
            if state.betas is not None
            else jnp.ones((ntemps,), dtype=dtype)
        )
        supps = state_branch_supps(state)
        scale = self._current_scale(kernel_state, dtype)
        eps_vecs = {
            n: scale * self._eps_for(n, coords[n].shape[-1], dtype)
            for n in names
        }
        masks = {n: inds[n][..., None] for n in names}

        def logP_sum(active_coords):
            full = {**other, **active_coords}
            lp = ctx.compute_log_prior(full, inds)
            ll, _ = ctx.compute_log_like(full, inds, lp, supps)
            logP = tempered_log_likelihood(ll, betas) + lp
            return jnp.sum(jnp.where(jnp.isfinite(logP), logP, 0.0)), (ll, lp)

        grad_fn = jax.value_and_grad(logP_sum, has_aux=True)

        key, k_p, k_acc = jax.random.split(key, 3)
        p_keys = jax.random.split(k_p, len(names))
        p0 = {
            n: jnp.where(
                masks[n], jax.random.normal(kp, coords[n].shape, dtype), 0.0
            )
            for n, kp in zip(names, p_keys)
        }

        def kinetic(p):
            total = jnp.zeros((ntemps, nwalkers), dtype=dtype)
            for n in names:
                total = total + 0.5 * jnp.where(masks[n], p[n] ** 2, 0.0).sum(
                    axis=(-2, -1)
                )
            return total

        (_, _aux0), g = grad_fn(coords)

        def half_kick(p, g):
            return {
                n: p[n] + 0.5 * eps_vecs[n] * jnp.where(masks[n], g[n], 0.0)
                for n in names
            }

        def drift(x, p):
            return {
                n: x[n] + eps_vecs[n] * jnp.where(masks[n], p[n], 0.0)
                for n in names
            }

        def leapfrog(carry, _):
            x, p, g = carry
            p = half_kick(p, g)
            x = drift(x, p)
            (_, _aux), g = grad_fn(x)
            p = half_kick(p, g)
            return (x, p, g), None

        (x1, p1, _g1), _ = jax.lax.scan(
            leapfrog, (coords, p0, g), None, length=self.num_leapfrog
        )

        (_, (ll1, lp1)), _ = grad_fn(x1)
        factors = kinetic(p0) - kinetic(p1)

        logP_new = tempered_log_likelihood(ll1, betas) + lp1
        logP_old = (
            tempered_log_likelihood(state.log_like, betas) + state.log_prior
        )
        acc = mh_accept(k_acc, factors, logP_new, logP_old)

        new_coords = dict(state.branches_coords)
        for n in names:
            new_coords[n] = jnp.where(
                acc[:, :, None, None], x1[n], coords[n]
            )
        logl = jnp.where(acc, ll1, state.log_like)
        logp = jnp.where(acc, lp1, state.log_prior)

        if self.tune_steps > 0 and kernel_state:
            kernel_state, _ = self._adapt_scale(
                kernel_state, acc.astype(dtype)
            )

        new_state = state.replace(
            coords=new_coords,
            inds=dict(state.branches_inds),
            log_like=logl,
            log_prior=logp,
        )
        return new_state, acc, kernel_state
