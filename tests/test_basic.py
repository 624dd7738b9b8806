"""End-to-end config A: 5-D Gaussian, single temperature, StretchMove.

Mirrors the reference smoke test (`/root/reference/tests/test_eryn.py:96-152`)
and adds the statistical assertions the reference lacks: posterior moments vs
the analytic truth and a sane acceptance fraction.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist


NDIM = 5
NWALKERS = 100


def jax_log_like(x, mu, invcov):
    diff = x - mu
    return -0.5 * jnp.sum(diff * (invcov @ diff))


@pytest.fixture
def gaussian_setup():
    means = np.zeros(NDIM)
    cov = np.diag(np.ones(NDIM))
    invcov = jnp.asarray(np.linalg.inv(cov))
    lims = 5.0
    priors = ProbDistContainer(
        {i: uniform_dist(-lims, lims) for i in range(NDIM)}
    )
    return means, invcov, priors


def test_base_run(gaussian_setup):
    means, invcov, priors = gaussian_setup
    ensemble = EnsembleSampler(
        NWALKERS,
        NDIM,
        jax_log_like,
        priors,
        args=[jnp.asarray(means), invcov],
        seed=10,
    )

    coords = priors.rvs(size=(NWALKERS,))
    state = ensemble.run_mcmc(coords, 500, burn=200, progress=False)

    # chain shape and getters
    chain = ensemble.get_chain()["model_0"]
    assert chain.shape == (500, 1, NWALKERS, 1, NDIM)
    ll = ensemble.get_log_like()
    assert ll.shape == (500, 1, NWALKERS)
    assert np.all(np.isfinite(ll))

    # acceptance fraction in the healthy range for a 5-D Gaussian stretch
    acc = ensemble.acceptance_fraction
    assert acc.shape == (1, NWALKERS)
    assert 0.2 < acc.mean() < 0.8

    # posterior moments vs analytic truth (mean 0, unit variance)
    flat = chain.reshape(-1, NDIM)
    assert np.abs(flat.mean(axis=0)).max() < 0.15
    assert np.abs(flat.std(axis=0) - 1.0).max() < 0.15


def test_prior_rejection(gaussian_setup):
    """Walkers never leave the prior support."""
    means, invcov, priors = gaussian_setup
    ensemble = EnsembleSampler(
        NWALKERS, NDIM, jax_log_like, priors, args=[jnp.asarray(means), invcov]
    )
    coords = priors.rvs(size=(NWALKERS,))
    ensemble.run_mcmc(coords, 100, burn=50)
    chain = ensemble.get_chain()["model_0"]
    assert np.all(np.abs(chain) <= 5.0)


def test_callback_likelihood(gaussian_setup):
    """Legacy NumPy likelihoods run through the pure_callback bridge."""
    means, invcov_j, priors = gaussian_setup
    invcov = np.asarray(invcov_j)

    def np_log_like(x, mu, icov):
        diff = np.asarray(x) - mu
        return -0.5 * (diff * np.dot(icov, diff.T).T).sum()

    with pytest.warns(UserWarning, match="not JAX-traceable"):
        ensemble = EnsembleSampler(
            32, NDIM, np_log_like, priors, args=[means, invcov], seed=3
        )
    coords = priors.rvs(size=(32,))
    ensemble.run_mcmc(coords, 20, burn=5)
    ll = ensemble.get_log_like()
    assert ll.shape == (20, 1, 32)
    assert np.all(np.isfinite(ll))

    # cross-check the callback path against direct evaluation
    chain = ensemble.get_chain()["model_0"][-1, 0, :, 0]
    expected = np.array([np_log_like(x, means, invcov) for x in chain])
    np.testing.assert_allclose(ll[-1, 0], expected, rtol=1e-4, atol=1e-4)


def test_resume_from_previous_state(gaussian_setup):
    means, invcov, priors = gaussian_setup
    ensemble = EnsembleSampler(
        NWALKERS, NDIM, jax_log_like, priors, args=[jnp.asarray(means), invcov]
    )
    coords = priors.rvs(size=(NWALKERS,))
    ensemble.run_mcmc(coords, 10)
    # continue from internal state
    ensemble.run_mcmc(None, 10)
    assert ensemble.get_log_like().shape[0] == 20


def test_dtype_kwarg(gaussian_setup):
    """The dtype kwarg controls device array precision."""
    means, invcov, priors = gaussian_setup
    ens = EnsembleSampler(
        32, NDIM, jax_log_like, priors, args=[jnp.asarray(means), invcov],
        seed=2, dtype=jnp.float32,
    )
    ens.run_mcmc(priors.rvs(size=(32,)), 20, burn=5)
    # the default backend stores in the compute dtype (the device chain IS
    # float32; an upcast would be lossless padding)
    assert ens.get_log_like().dtype == np.float32
    assert ens._previous_state.log_like.dtype == jnp.float32


def test_sample_generator(gaussian_setup):
    """The sample() generator yields per-iteration states and stores them."""
    means, invcov, priors = gaussian_setup
    ens = EnsembleSampler(
        32, NDIM, jax_log_like, priors, args=[jnp.asarray(means), invcov], seed=5
    )
    coords = priors.rvs(size=(32,))
    states = []
    for state in ens.sample(coords, iterations=5, thin_by=2):
        states.append(state)
    assert len(states) == 5
    assert ens.backend.iteration == 5
    # each yielded state matches the stored chain
    last = ens.backend.get_last_sample()
    np.testing.assert_allclose(
        np.asarray(states[-1].log_like), np.asarray(last.log_like), rtol=1e-5
    )


def test_sample_hooks_and_tune(gaussian_setup):
    """Driving sample() directly fires update_fn every update_iterations and
    move.tune on moves that override the stub (ref ensemble.py:983-984,
    1033-1038)."""
    from eryn_tpu.moves import GaussianMove

    means, invcov, priors = gaussian_setup
    update_calls = []

    class TunedGaussian(GaussianMove):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.tune_calls = 0

        def tune(self, state, accepted):
            self.tune_calls += 1

    move = TunedGaussian({"model_0": 0.5 * np.ones(NDIM)})
    ens = EnsembleSampler(
        32,
        NDIM,
        jax_log_like,
        priors,
        args=[jnp.asarray(means), invcov],
        moves=[move],
        update_fn=lambda it, state, sampler: update_calls.append(it),
        update_iterations=2,
        seed=7,
    )
    coords = priors.rvs(size=(32,))
    for _ in ens.sample(coords, iterations=6, tune=True):
        pass
    assert update_calls == [2, 4, 6]
    assert move.tune_calls == 6


def test_burn_ignores_thin_by(gaussian_setup):
    """Regression: thin_by must not multiply burn-in work — the reference
    documents burn as thin_by=1 (ref ensemble.py:1061,1085-1087).  Verified
    through the per-move proposal counter."""
    from eryn_tpu.moves import StretchMove

    means, invcov, priors = gaussian_setup
    move = StretchMove()
    ens = EnsembleSampler(
        32,
        NDIM,
        jax_log_like,
        priors,
        args=[jnp.asarray(means), invcov],
        moves=[move],
        seed=8,
    )
    coords = priors.rvs(size=(32,))
    ens.run_mcmc(coords, 4, burn=3, thin_by=5)
    # 3 burn proposals + 4 * 5 stored-path proposals
    assert move.num_proposals == 3 + 4 * 5


def test_sample_update_cadence_counts_proposals(gaussian_setup):
    """Regression: with thin_by > 1 the in-sample update hook fires every
    update_iterations *proposal steps* (reference counts thin steps inside
    sample(), ensemble.py:1033-1038), not every update_iterations yields."""
    means, invcov, priors = gaussian_setup
    update_calls = []
    ens = EnsembleSampler(
        32,
        NDIM,
        jax_log_like,
        priors,
        args=[jnp.asarray(means), invcov],
        update_fn=lambda it, state, sampler: update_calls.append(it),
        update_iterations=10,
        seed=9,
    )
    coords = priors.rvs(size=(32,))
    for _ in ens.sample(coords, iterations=6, thin_by=5):
        pass
    # proposal counts after each yield: 5, 10, 15, ... -> crossings of 10
    # at yields 2, 4, 6
    assert update_calls == [2, 4, 6]


def test_run_mcmc_hooks_fire_with_unaligned_segments(gaussian_setup):
    """Regression: an explicit segment_size that does not divide the hook
    intervals must still fire each hook on the first boundary at or past its
    multiple (previously hooks silently never fired)."""
    means, invcov, priors = gaussian_setup
    update_calls = []
    stop_calls = []

    def stopping_fn(i, state, sampler):
        stop_calls.append(i)
        return False

    ens = EnsembleSampler(
        32,
        NDIM,
        jax_log_like,
        priors,
        args=[jnp.asarray(means), invcov],
        update_fn=lambda it, state, sampler: update_calls.append(it),
        update_iterations=10,
        stopping_fn=stopping_fn,
        stopping_iterations=10,
        seed=10,
    )
    coords = priors.rvs(size=(32,))
    ens.run_mcmc(coords, 20, segment_size=7)
    # segments land at i = 7, 14, 18, 20: multiples of 10 are crossed at
    # i=14 (10) and i=20 (20)
    assert update_calls == [14, 20]
    assert stop_calls == [14, 20]


def test_run_mcmc_tune_and_state_check_kwargs(gaussian_setup):
    """run_mcmc forwards tune= to move.tune overrides and honors
    skip_initial_state_check (both were previously swallowed by **kwargs)."""
    from eryn_tpu.moves import GaussianMove

    means, invcov, priors = gaussian_setup

    class TunedGaussian(GaussianMove):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.tune_calls = 0

        def tune(self, state, accepted):
            self.tune_calls += 1

    move = TunedGaussian({"model_0": 0.5 * np.ones(NDIM)})
    ens = EnsembleSampler(
        32,
        NDIM,
        jax_log_like,
        priors,
        args=[jnp.asarray(means), invcov],
        moves=[move],
        seed=11,
    )
    coords = priors.rvs(size=(32,))
    ens.run_mcmc(coords, 3, burn=2, tune=True)
    assert move.tune_calls > 0
    # unknown kwargs now fail loudly instead of being silently dropped
    with pytest.raises(TypeError):
        ens.run_mcmc(coords, 1, not_a_real_kwarg=True)
