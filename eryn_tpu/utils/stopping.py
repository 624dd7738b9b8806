"""Stopping criteria.

Re-design of ``/root/reference/src/eryn/utils/stopping.py:8-164`` (including
``AutoCorrelationStop``, which exists only as a commented block in the
reference — implemented here as a working criterion).
"""

from __future__ import annotations

from abc import ABC

import numpy as np

__all__ = ["Stopping", "SearchConvergeStopping", "AutoCorrelationStop"]


class Stopping(ABC):
    """Base class for stopping functions (ref ``stopping.py:8-29``)."""

    def __call__(self, iter, last_sample, sampler):
        raise NotImplementedError


class SearchConvergeStopping(Stopping):
    """Stop when the maximum log-likelihood plateaus
    (ref ``stopping.py:31-114``).

    Args:
        n_iters: number of consecutive checks within ``diff`` needed to stop.
        diff: plateau tolerance on the best log-likelihood.
        start_iteration: ignore iterations before this.
        verbose: print progress.
    """

    def __init__(self, n_iters=30, diff=0.1, start_iteration=0, verbose=False):
        self.n_iters = n_iters
        self.diff = diff
        self.verbose = verbose
        self.start_iteration = start_iteration
        self.iters_consecutive = 0
        self.past_like_best = -np.inf

    def __call__(self, iter, sample, sampler):
        if iter < self.start_iteration:
            return False

        like_best = sampler.get_log_like(discard=self.start_iteration).max()

        if np.abs(like_best - self.past_like_best) < self.diff:
            self.iters_consecutive += 1
        else:
            self.iters_consecutive = 0
            self.past_like_best = like_best

        if self.verbose:
            print(
                f"\nITERS CONSECUTIVE: {self.iters_consecutive}",
                f"Previous best LL: {self.past_like_best}",
                f"Current best LL: {like_best}\n",
            )

        if self.iters_consecutive >= self.n_iters:
            self.iters_consecutive = 0
            return True
        return False


class AutoCorrelationStop(Stopping):
    """Stop when the chain exceeds ``autocorr_multiplier`` integrated
    autocorrelation times and the IACT estimate has stabilized (the reference
    sketches this at ``stopping.py:117-164`` but ships it commented out)."""

    def __init__(self, autocorr_multiplier=50, rel_tol=0.01, verbose=False):
        self.autocorr_multiplier = autocorr_multiplier
        self.rel_tol = rel_tol
        self.verbose = verbose
        self.time = 0
        self.old_tau = None

    def __call__(self, iter, last_sample, sampler):
        tau = sampler.backend.get_autocorr_time(multiply_thin=False)
        stop = False
        if self.time > 0:
            iteration = sampler.backend.iteration
            finish = []
            for name in tau:
                t = np.atleast_1d(tau[name]).astype(float).ravel()
                old = np.atleast_1d(self.old_tau[name]).astype(float).ravel()
                # NaN taus (e.g. an RJ leaf slot that never activated) carry
                # no information — judge convergence on the finite entries
                good = np.isfinite(t) & np.isfinite(old)
                if not np.any(good):
                    finish.append(False)
                    continue
                t, old = t[good], old[good]
                converged = np.all(t * self.autocorr_multiplier < iteration)
                with np.errstate(invalid="ignore", divide="ignore"):
                    converged &= np.all(np.abs(old - t) / t < self.rel_tol)
                finish.append(bool(converged))
            stop = all(finish)
            if self.verbose:
                print(
                    "\ntau:", tau, "\nIteration:", iteration,
                    "\nAutocorrelation multiplier:", self.autocorr_multiplier,
                    "\nStopping:", stop, "\n",
                )
        self.old_tau = tau
        self.time += 1
        return stop
