"""HMC move (TPU-native extension: leapfrog via lax.scan over jax.grad)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
from eryn_tpu.moves import HMCMove, StretchMove

NDIM = 5
NWALKERS = 32


@pytest.fixture
def priors():
    return ProbDistContainer({i: uniform_dist(-8, 8) for i in range(NDIM)})


def test_hmc_correlated_gaussian(priors):
    """HMC samples a strongly correlated Gaussian correctly and decorrelates
    much faster than the stretch move per stored step."""
    rho = 0.9
    cov = rho * np.ones((NDIM, NDIM)) + (1 - rho) * np.eye(NDIM)
    invcov = jnp.asarray(np.linalg.inv(cov))
    cov_j = jnp.asarray(cov)

    def ll(x):
        return -0.5 * x @ (invcov @ x)

    nsteps, burn = 500, 200
    ens = EnsembleSampler(
        NWALKERS,
        NDIM,
        ll,
        priors,
        moves=[HMCMove(eps=0.25, num_leapfrog=8)],
        seed=71,
    )
    coords = np.random.randn(NWALKERS, NDIM) @ np.linalg.cholesky(cov).T
    ens.run_mcmc(coords, nsteps, burn=burn)
    chain = ens.get_chain()["model_0"].reshape(-1, NDIM)
    assert np.abs(chain.mean(axis=0)).max() < 0.2
    emp_cov = np.cov(chain.T)
    assert np.abs(emp_cov - cov).max() < 0.3
    acc = float(ens.acceptance_fraction.mean())
    assert acc > 0.5, acc

    base = EnsembleSampler(
        NWALKERS, NDIM, ll, priors, moves=[StretchMove()], seed=71
    )
    base.run_mcmc(coords, nsteps, burn=burn)
    tau_hmc = np.nanmax(ens.get_autocorr_time()["model_0"])
    tau_stretch = np.nanmax(base.get_autocorr_time()["model_0"])
    assert tau_hmc < tau_stretch, (tau_hmc, tau_stretch)


def test_hmc_tempered(priors):
    def ll(x):
        return -0.5 * jnp.sum(x**2)

    ens = EnsembleSampler(
        NWALKERS,
        NDIM,
        ll,
        priors,
        moves=[HMCMove(eps=0.3, num_leapfrog=5)],
        tempering_kwargs=dict(ntemps=4),
        seed=72,
    )
    coords = priors.rvs(size=(4, NWALKERS))
    ens.run_mcmc(coords, 250, burn=150)
    llv = ens.get_log_like()
    assert llv[:, 0].mean() > llv[:, -1].mean()
    chain = ens.get_chain()["model_0"][:, 0].reshape(-1, NDIM)
    assert np.abs(chain.std(axis=0) - 1.0).max() < 0.2
