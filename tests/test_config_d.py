"""Config D analog (BASELINE configs[3]): multi-branch sine + Gaussian with
GroupStretchMove and DelayedRejection, plus the multivariate-prior test
(analog of `/root/reference/tests/test_eryn.py:1235-1241`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist
from eryn_tpu.prior import mvn_dist
from eryn_tpu.moves import (
    CombineMove,
    DelayedRejection,
    GaussianMove,
    GroupStretchMove,
)

NWALKERS = 36
NTEMPS = 3


def test_config_d_group_stretch_with_dr():
    rng = np.random.default_rng(9)
    t_np = np.linspace(0, 10, 96)
    sigma = 0.4
    signal = 2.5 * np.exp(-((t_np - 4.0) ** 2) / (2 * 0.7**2)) + 1.5 * np.sin(
        2 * np.pi * 0.3 * t_np + 0.5
    )
    data_np = signal + sigma * rng.standard_normal(len(t_np))
    t, data = jnp.asarray(t_np), jnp.asarray(data_np)

    def log_like(coords, inds):
        g, s = coords["gauss"], coords["sine"]
        gm, sm = inds["gauss"], inds["sine"]
        pulses = g[:, 0][:, None] * jnp.exp(
            -((t[None] - g[:, 1][:, None]) ** 2) / (2 * g[:, 2][:, None] ** 2)
        )
        tmpl = jnp.sum(jnp.where(gm[:, None], pulses, 0.0), axis=0)
        sines = s[:, 0][:, None] * jnp.sin(
            2 * jnp.pi * s[:, 1][:, None] * t[None] + s[:, 2][:, None]
        )
        tmpl = tmpl + jnp.sum(jnp.where(sm[:, None], sines, 0.0), axis=0)
        return -0.5 * jnp.sum(((tmpl - data) / sigma) ** 2)

    priors = {
        "gauss": ProbDistContainer(
            {
                0: uniform_dist(0.5, 5.0),
                1: uniform_dist(0.0, 10.0),
                2: uniform_dist(0.2, 2.0),
            }
        ),
        "sine": ProbDistContainer(
            {
                0: uniform_dist(0.3, 4.0),
                1: uniform_dist(0.05, 1.0),
                2: uniform_dist(0.0, 2 * np.pi),
            }
        ),
    }
    move = CombineMove(
        [
            GroupStretchMove(n_iter_update=20),
            DelayedRejection(
                GaussianMove(
                    {"gauss": 0.01 * np.ones(3), "sine": 0.01 * np.ones(3)}
                ),
                max_iter=2,
            ),
        ]
    )
    ens = EnsembleSampler(
        NWALKERS,
        {"gauss": 3, "sine": 3},
        log_like,
        priors,
        branch_names=["gauss", "sine"],
        nleaves_max={"gauss": 1, "sine": 1},
        moves=[move],
        periodic={"sine": {2: 2 * np.pi}},
        tempering_kwargs=dict(ntemps=NTEMPS),
        seed=50,
    )
    coords = {
        n: priors[n].rvs(size=(NTEMPS, NWALKERS, 1)) for n in priors
    }
    ens.run_mcmc(State(coords), 400, burn=400)

    chain_g = ens.get_chain()["gauss"][:, 0].reshape(-1, 3)
    chain_s = ens.get_chain()["sine"][:, 0].reshape(-1, 3)
    # recover pulse center and sine frequency
    assert abs(np.median(chain_g[:, 1]) - 4.0) < 0.4
    assert abs(np.median(chain_s[:, 1]) - 0.3) < 0.05
    # periodic phase stays wrapped
    assert chain_s[:, 2].min() >= 0.0 and chain_s[:, 2].max() <= 2 * np.pi


def test_multivariate_prior_key():
    """Tuple prior keys with a correlated multivariate normal
    (analog of test_2d_prior)."""
    cov = np.array([[1.0, 0.7], [0.7, 1.0]])
    priors = ProbDistContainer(
        {(0, 1): mvn_dist(np.zeros(2), cov), 2: uniform_dist(-3, 3)}
    )
    assert priors.ndim == 3

    # logpdf matches scipy
    from scipy import stats

    x = np.random.randn(10, 3)
    expected = stats.multivariate_normal(np.zeros(2), cov).logpdf(x[:, :2])
    expected = expected + stats.uniform(-3, 6).logpdf(x[:, 2])
    np.testing.assert_allclose(np.asarray(priors.logpdf(x)), expected, rtol=1e-5)

    # sampling respects the correlation
    samples = priors.rvs(size=20000)
    corr = np.corrcoef(samples[:, 0], samples[:, 1])[0, 1]
    assert abs(corr - 0.7) < 0.05

    # and it works end-to-end as a sampler prior
    ens = EnsembleSampler(
        32,
        3,
        lambda x: -0.5 * jnp.sum(x**2),
        priors,
        seed=51,
    )
    ens.run_mcmc(priors.rvs(size=(32,)), 100, burn=50)
    assert np.isfinite(ens.get_log_prior()).all()
