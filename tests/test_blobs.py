"""Blobs (per-walker auxiliary outputs from the likelihood) and getter
slicing kwargs."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist

NDIM = 2
NWALKERS = 24


def log_like_with_blobs(x):
    ll = -0.5 * jnp.sum(x**2)
    # blobs: the per-walker chi2 and the first parameter
    return ll, jnp.array([-2.0 * ll, x[0]])


@pytest.fixture
def priors():
    return ProbDistContainer({i: uniform_dist(-5, 5) for i in range(NDIM)})


def test_blobs_roundtrip(priors):
    ens = EnsembleSampler(
        NWALKERS,
        NDIM,
        log_like_with_blobs,
        priors,
        tempering_kwargs=dict(ntemps=3),
        seed=30,
    )
    assert ens._like_eval.returns_blobs
    ens.run_mcmc(priors.rvs(size=(3, NWALKERS)), 40, burn=10)
    blobs = ens.get_blobs()
    assert blobs.shape == (40, 3, NWALKERS, 2)
    ll = ens.get_log_like()
    # blob[0] == -2 * log_like for the stored states
    np.testing.assert_allclose(blobs[..., 0], -2.0 * ll, rtol=1e-4)
    # blob[1] == param 0 of the stored chain
    chain = ens.get_chain()["model_0"]
    np.testing.assert_allclose(blobs[..., 1], chain[:, :, :, 0, 0], rtol=1e-4)


def test_getter_slicing(priors):
    ens = EnsembleSampler(
        NWALKERS,
        NDIM,
        lambda x: -0.5 * jnp.sum(x**2),
        priors,
        tempering_kwargs=dict(ntemps=4),
        seed=31,
    )
    ens.run_mcmc(priors.rvs(size=(4, NWALKERS)), 30)
    c = ens.get_chain(temp_index=0)["model_0"]
    assert c.shape == (30, NWALKERS, 1, NDIM)
    ll = ens.get_log_like(discard=10, thin=2, temp_index=1)
    assert ll.shape == (10, NWALKERS)
    only = ens.get_chain(branch_names="model_0")
    assert set(only) == {"model_0"}
