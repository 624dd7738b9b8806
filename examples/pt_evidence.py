"""Parallel tempering + model evidence via stepping-stone integration.

Run: python examples/pt_evidence.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist

from _common import example_steps as _steps



def main():
    ndim, nwalkers, ntemps = 3, 64, 14

    def log_like(x):
        return -0.5 * jnp.sum(x**2)

    lim = 8.0
    priors = ProbDistContainer(
        {i: uniform_dist(-lim, lim) for i in range(ndim)}
    )

    ensemble = EnsembleSampler(
        nwalkers,
        ndim,
        log_like,
        priors,
        # freeze the ladder so the evidence integral is well defined
        tempering_kwargs=dict(ntemps=ntemps, adaptive=False),
        seed=3,
    )
    coords = priors.rvs(size=(ntemps, nwalkers))
    ensemble.run_mcmc(coords, _steps(2000), burn=_steps(500), progress=True)

    logz_ss, dlogz_ss = ensemble.backend.get_evidence_estimate(
        discard=_steps(500), method="stepping_stone"
    )
    logz_ti, dlogz_ti = ensemble.backend.get_evidence_estimate(
        discard=_steps(500)
    )
    analytic = 0.5 * ndim * np.log(2 * np.pi) - ndim * np.log(2 * lim)
    print(f"stepping-stone logZ = {logz_ss:.3f} +- {dlogz_ss:.3f}")
    print(f"thermodynamic  logZ = {logz_ti:.3f} +- {dlogz_ti:.3f}")
    print(f"analytic       logZ = {analytic:.3f}")
    print("swap acceptance per rung:", np.round(ensemble.swap_acceptance_fraction, 3))


if __name__ == "__main__":
    main()
