"""Gibbs-split proposals (analog of
`/root/reference/tests/test_eryn.py:509-658`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
from eryn_tpu.moves import CombineMove, GaussianMove, StretchMove

NDIM = 4
NWALKERS = 40


def log_like(x):
    return -0.5 * jnp.sum(x**2)


@pytest.fixture
def priors():
    return ProbDistContainer({i: uniform_dist(-8, 8) for i in range(NDIM)})


def test_parameter_level_gibbs(priors):
    # split the 4 parameters into two gibbs iterations
    m1 = np.zeros((1, NDIM), dtype=bool)
    m1[:, :2] = True
    m2 = np.zeros((1, NDIM), dtype=bool)
    m2[:, 2:] = True
    move = GaussianMove(
        {"model_0": 0.8 * np.ones(NDIM)},
        gibbs_sampling_setup=[("model_0", m1), ("model_0", m2)],
    )
    ens = EnsembleSampler(NWALKERS, NDIM, log_like, priors, moves=[move], seed=6)
    coords = 0.1 * np.random.randn(NWALKERS, NDIM)
    ens.run_mcmc(coords, 400, burn=200)
    chain = ens.get_chain()["model_0"].reshape(-1, NDIM)
    assert np.abs(chain.mean(axis=0)).max() < 0.25
    assert np.abs(chain.std(axis=0) - 1.0).max() < 0.25


def test_gibbs_stretch_combined(priors):
    m1 = np.zeros((1, NDIM), dtype=bool)
    m1[:, ::2] = True
    m2 = ~m1
    move = CombineMove(
        [
            StretchMove(
                gibbs_sampling_setup=[("model_0", m1), ("model_0", m2)]
            ),
            GaussianMove(
                {"model_0": np.ones(NDIM)},
                gibbs_sampling_setup="model_0",
            ),
        ]
    )
    ens = EnsembleSampler(NWALKERS, NDIM, log_like, priors, moves=[move], seed=8)
    coords = 0.1 * np.random.randn(NWALKERS, NDIM)
    ens.run_mcmc(coords, 400, burn=200)
    chain = ens.get_chain()["model_0"].reshape(-1, NDIM)
    assert np.abs(chain.mean(axis=0)).max() < 0.25
    assert np.abs(chain.std(axis=0) - 1.0).max() < 0.25


def test_gibbs_bad_inputs():
    with pytest.raises(ValueError):
        StretchMove(gibbs_sampling_setup=42)
    with pytest.raises(ValueError):
        # 1D mask is invalid
        StretchMove(gibbs_sampling_setup=("model_0", np.ones(3, dtype=bool)))
