"""Adaptive independence Metropolis-Hastings — the DIME component.

No reference equivalent.  The adaptive-proposal half of the DIME sampler
(Boehl 2022, "DIME MCMC: a simple and robust estimator for Bayesian
inference"): a multivariate Student-t independence proposal whose
location/scale are fitted to an exponentially discounted history of the
ensemble itself.  Because the proposal accumulates EVERY past iteration
(unlike :class:`~eryn_tpu.moves.kde.KDEMove`, which densities only the
current complement half), it learns all discovered posterior modes and
proposes global jumps between them — the robust multimodal workhorse.

DIME itself is the schedule ``moves=[(DEMove(), 1 - p), (AIMHMove(), p)]``
with small ``p`` (component-wise mixture MH: each sampler step picks one
component with fixed probability and accepts with that component's own
Hastings ratio, which is exactly valid).

The independence structure makes the whole ensemble updatable at once
(the proposal does not depend on the walker being moved), and the
discounted-moment fit is three small reductions per rung — everything
stays inside the compiled step.  Adaptation freezes after ``tune_steps``
proposals (run them inside burn-in); afterwards the kernel is a fixed
independence sampler, so detailed balance is exact.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .move import Move, mh_accept, state_branch_supps
from .tempering import tempered_log_likelihood

__all__ = ["AIMHMove"]


class AIMHMove(Move):
    """Adaptive Student-t independence proposal (per temperature rung).

    Args:
        df: Student-t degrees of freedom (heavy tails keep global jumps
            alive; Boehl's default is 10).
        rho: per-proposal discount factor on the accumulated ensemble
            moments (0.999 keeps a long memory; smaller adapts faster).
        tune_steps: number of adapting proposals, after which the fitted
            proposal freezes (0 disables adaptation: the initial-ensemble
            fit is used forever).
        jitter: diagonal variance floor added to the fitted covariance
            (numerical floor; also the cold-start width regularizer).

    Notes:
        Requires fixed-dimension models: reversible-jump leaf masks make
        the flattened parameter vector change meaning across walkers, so
        construction-time all-active masks are enforced in
        ``init_kernel_state``.  Tempered runs fit separate moments per
        rung (each rung's proposal approximates its own tempered target).
    """

    def __init__(self, df=10.0, rho=0.999, tune_steps=500, jitter=1e-6, **kwargs):
        super().__init__(**kwargs)
        if df <= 2.0:
            raise ValueError("df must exceed 2 (finite proposal covariance).")
        self.df = float(df)
        self.rho = float(rho)
        self.tune_steps = int(tune_steps)
        self.jitter = float(jitter)

    # ------------------------------------------------------------------
    def _flatten(self, state, names):
        """(ntemps, nwalkers, D) flattened coordinates of the run branches."""
        nt, nw = state.log_like.shape
        return jnp.concatenate(
            [state.branches_coords[n].reshape(nt, nw, -1) for n in names],
            axis=-1,
        )

    def _unflatten(self, state, names, flat):
        out = {}
        off = 0
        for n in names:
            shape = state.branches_coords[n].shape
            k = int(np.prod(shape[2:]))
            out[n] = flat[..., off : off + k].reshape(shape)
            off += k
        return out

    def init_kernel_state(self, state):
        names = self.run_branches(state)
        for n in names:
            m = np.asarray(state.branches_inds[n])
            if not m.all():
                raise ValueError(
                    "AIMHMove requires fixed-dimension models (all leaves "
                    "active): reversible-jump masks change the meaning of "
                    "the flattened parameter vector. Use KDEMove/DEMove "
                    "for trans-dimensional targets."
                )
        x = self._flatten(state, names)
        dtype = state.log_like.dtype
        nt, nw, D = x.shape
        w = jnp.full((nt,), float(nw), dtype)
        mean = x.mean(axis=1)  # (nt, D)
        second = jnp.einsum("twi,twj->tij", x, x) / nw  # (nt, D, D)
        return {
            "w": w,
            "mean": mean,
            "second": second,
            "t": jnp.zeros((), jnp.int32),
        }

    def _proposal_params(self, ks, dtype, D):
        """(mean, cholesky of covariance) per rung from the moment state."""
        mean = ks["mean"]
        cov = ks["second"] - jnp.einsum("ti,tj->tij", mean, mean)
        cov = cov + self.jitter * jnp.eye(D, dtype=dtype)[None]
        chol = jnp.linalg.cholesky(cov)
        return mean, chol

    def _t_logpdf(self, x, mean, chol):
        """Multivariate Student-t logpdf per (rung, walker).

        ``x`` (nt, nw, D); ``mean`` (nt, D); ``chol`` (nt, D, D).  The
        normalization constant is shared by the forward and reverse
        densities and cancels in the Hastings ratio, EXCEPT the
        determinant term — which is also shared (same rung) — so only the
        quadratic-form kernel matters; kept explicit for clarity."""
        D = x.shape[-1]
        d = x - mean[:, None, :]
        # solve L y = d  -> quadratic form ||y||^2
        y = jax.vmap(
            lambda L, dd: jax.scipy.linalg.solve_triangular(
                L, dd.T, lower=True
            ).T
        )(chol, d)
        q = jnp.sum(y**2, axis=-1)  # (nt, nw)
        return -0.5 * (self.df + D) * jnp.log1p(q / self.df)

    def _propose_impl(self, key, state, ctx, kernel_state=()):
        if self.gibbs_sampling_setup_input is not None:
            raise ValueError(
                "gibbs_sampling_setup is not supported by AIMHMove (the "
                "fitted proposal is joint over the flattened parameters); "
                "use proposal_branch_names to restrict branches."
            )
        names = self.run_branches(state)
        ks = kernel_state if isinstance(kernel_state, dict) else None
        dtype = state.log_like.dtype
        nt, nw = state.log_like.shape
        x = self._flatten(state, names)
        D = x.shape[-1]

        if ks is None:  # bare kernel call: fit to the current ensemble
            ks = self.init_kernel_state(state)

        mean, chol = self._proposal_params(ks, dtype, D)

        key, k_z, k_u, k_acc = jax.random.split(key, 4)
        z = jax.random.normal(k_z, (nt, nw, D), dtype)
        u = jax.random.chisquare(k_u, self.df, shape=(nt, nw)).astype(dtype)
        step = jnp.einsum("tij,twj->twi", chol, z)
        q_flat = mean[:, None, :] + step * jnp.sqrt(
            self.df / jnp.maximum(u, 1e-12)
        )[..., None]
        if self.periodic is not None:
            q_branches = self.periodic.wrap(
                self._unflatten(state, names, q_flat)
            )
            q_flat = jnp.concatenate(
                [
                    q_branches[n].reshape(nt, nw, -1)
                    for n in names
                ],
                axis=-1,
            )
        else:
            q_branches = self._unflatten(state, names, q_flat)

        # independence Hastings factor: log q(x_old) - log q(x_new)
        factors = self._t_logpdf(x, mean, chol) - self._t_logpdf(
            q_flat, mean, chol
        )

        # evaluate the proposal
        betas = (
            state.betas
            if state.betas is not None
            else jnp.ones((nt,), dtype=dtype)
        )
        inds = dict(state.branches_inds)
        full = dict(state.branches_coords)
        full.update(q_branches)
        supps = state_branch_supps(state)
        lp1 = ctx.compute_log_prior(full, inds)
        ll1, blobs1 = ctx.compute_log_like(full, inds, lp1, supps)

        logP_new = tempered_log_likelihood(ll1, betas) + lp1
        logP_old = (
            tempered_log_likelihood(state.log_like, betas) + state.log_prior
        )
        acc = mh_accept(k_acc, factors, logP_new, logP_old)

        new_coords = dict(state.branches_coords)
        for n in names:
            new_coords[n] = jnp.where(
                acc[:, :, None, None], q_branches[n], state.branches_coords[n]
            )
        logl = jnp.where(acc, ll1, state.log_like)
        logp = jnp.where(acc, lp1, state.log_prior)
        blobs = state.blobs
        if blobs is not None and blobs1 is not None:
            acc_b = acc.reshape(acc.shape + (1,) * (blobs.ndim - 2))
            blobs = jnp.where(acc_b, blobs1, blobs)

        # discounted moment update from the POST-accept ensemble (frozen
        # once t >= tune_steps — run the adaptation inside burn-in)
        if self.tune_steps > 0:
            x_new = jnp.concatenate(
                [new_coords[n].reshape(nt, nw, -1) for n in names], axis=-1
            )
            tuning = ks["t"] < self.tune_steps
            w_new = self.rho * ks["w"] + nw
            mean_new = (
                self.rho * ks["w"][:, None] * ks["mean"] + x_new.sum(axis=1)
            ) / w_new[:, None]
            second_new = (
                self.rho * ks["w"][:, None, None] * ks["second"]
                + jnp.einsum("twi,twj->tij", x_new, x_new)
            ) / w_new[:, None, None]
            ks = {
                "w": jnp.where(tuning, w_new, ks["w"]),
                "mean": jnp.where(tuning, mean_new, ks["mean"]),
                "second": jnp.where(tuning, second_new, ks["second"]),
                "t": ks["t"] + 1,
            }

        new_state = state.replace(
            coords=new_coords,
            inds=inds,
            log_like=logl,
            log_prior=logp,
            blobs=blobs,
        )
        return new_state, acc, ks
