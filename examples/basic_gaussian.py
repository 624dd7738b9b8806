"""Fit a multivariate Gaussian: the minimal eryn_tpu workflow.

Run: python examples/basic_gaussian.py
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
    ndim, nwalkers = 5, 100

    means = jnp.zeros(ndim)
    invcov = jnp.eye(ndim)

    def log_like(x):
        diff = x - means
        return -0.5 * jnp.sum(diff * (invcov @ diff))

    priors = ProbDistContainer(
        {i: uniform_dist(-5.0, 5.0) for i in range(ndim)}
    )

    ensemble = EnsembleSampler(nwalkers, ndim, log_like, priors, seed=42)
    coords = priors.rvs(size=(nwalkers,))
    ensemble.run_mcmc(coords, _steps(2000), burn=_steps(500), progress=True)

    chain = ensemble.get_chain()["model_0"].reshape(-1, ndim)
    print("posterior mean:", np.round(chain.mean(axis=0), 3))
    print("posterior std:", np.round(chain.std(axis=0), 3))
    print("acceptance fraction:", float(ensemble.acceptance_fraction.mean()))
    print("throughput:", ensemble.timing.summary())


if __name__ == "__main__":
    main()
