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


def test_callback_blobs(priors):
    """Legacy NumPy likelihoods returning [log_like, *blobs] per walker work
    through the host-callback bridge (ref ensemble.py:1489-1500): blob shape
    is discovered at the setup-time eager evaluation and the traced path
    declares the extra output channel."""

    def numpy_like(x):
        # non-traceable on purpose: forces the callback path
        x = np.asarray(x)
        ll = float(-0.5 * np.sum(x**2))
        return [ll, -2.0 * ll, x[0]]

    ens = EnsembleSampler(
        NWALKERS, NDIM, numpy_like, priors, seed=31
    )
    assert ens._like_eval.mode == "callback"
    ens.run_mcmc(priors.rvs(size=(NWALKERS,)), 15)
    assert ens._like_eval.returns_blobs
    blobs = ens.get_blobs()
    assert blobs.shape == (15, 1, NWALKERS, 2)
    ll = ens.get_log_like()
    np.testing.assert_allclose(blobs[..., 0], -2.0 * ll, rtol=1e-4)
    chain = ens.get_chain()["model_0"]
    np.testing.assert_allclose(blobs[..., 1], chain[:, :, :, 0, 0], rtol=1e-4)


def test_blobs_follow_delayed_rejection_and_mt_rj(priors):
    """Regression: DelayedRejection and MTDistGenMoveRJ must merge blobs on
    accept — the stored blob must stay consistent with the stored chain
    (blob[0] == -2 * log_like identity)."""
    from eryn_tpu.moves import DelayedRejection, GaussianMove, MTDistGenMoveRJ

    # --- DelayedRejection ---
    inner = GaussianMove({"model_0": 1.5 * np.ones(NDIM)})
    dr = DelayedRejection(inner, max_iter=2)
    ens = EnsembleSampler(
        NWALKERS, NDIM, log_like_with_blobs, priors, moves=[dr], seed=33
    )
    ens.run_mcmc(0.3 * np.random.randn(NWALKERS, NDIM), 30)
    blobs = ens.get_blobs()
    ll = ens.get_log_like()
    np.testing.assert_allclose(blobs[..., 0], -2.0 * ll, rtol=1e-4)

    # --- MT-RJ ---
    def ll_rj(coords, inds):
        active = jnp.where(inds[:, None], coords, 0.0)
        llv = -0.5 * jnp.sum(active**2)
        return llv, jnp.array([-2.0 * llv])

    pr = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(NDIM)})
    rj_move = MTDistGenMoveRJ(
        {"model_0": pr},
        nleaves_max={"model_0": 2},
        nleaves_min={"model_0": 0},
        num_try=4,
    )
    ens2 = EnsembleSampler(
        NWALKERS,
        NDIM,
        ll_rj,
        pr,
        nleaves_max=2,
        nleaves_min=0,
        rj_moves=[rj_move],
        fill_zero_leaves_val=0.0,
        seed=34,
    )
    coords = pr.rvs(size=(1, NWALKERS, 2))
    inds = np.random.rand(1, NWALKERS, 2) < 0.5
    from eryn_tpu import State

    ens2.run_mcmc(
        State({"model_0": coords}, inds={"model_0": inds}), 40
    )
    blobs2 = ens2.get_blobs()
    ll2 = ens2.get_log_like()
    np.testing.assert_allclose(blobs2[..., 0], -2.0 * ll2, rtol=1e-4)


def test_vectorized_callback_keepdims_not_blobs(priors):
    """Regression: a vectorized host likelihood returning (nkeep, 1)
    (keepdims) is a plain likelihood, not zero-width blobs (the reference
    squeezes the same way, ensemble.py:1490)."""

    def numpy_like_vec(x):
        x = np.asarray(x)
        return -0.5 * np.sum(x**2, axis=-1, keepdims=True)

    ens = EnsembleSampler(
        NWALKERS, NDIM, numpy_like_vec, priors, vectorize=True, seed=35
    )
    assert ens._like_eval.mode == "callback"
    ens.run_mcmc(priors.rvs(size=(NWALKERS,)), 10)
    assert not ens._like_eval.returns_blobs
    assert ens.get_blobs() is None
    assert np.isfinite(ens.get_log_like()).all()
