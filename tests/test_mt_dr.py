"""Multiple-try moves (in-model + RJ) and delayed rejection (analogs of
`/root/reference/tests/test_eryn.py:1047-1233` and the DR example)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist
from eryn_tpu.prior import normal_dist
from eryn_tpu.moves import (
    DelayedRejection,
    GaussianMove,
    MTDistGenMove,
    MTDistGenMoveRJ,
)

NDIM = 3
NWALKERS = 32


def log_like(x):
    return -0.5 * jnp.sum(x**2)


@pytest.fixture
def priors():
    return ProbDistContainer({i: uniform_dist(-6, 6) for i in range(NDIM)})


def test_mt_distgen(priors):
    gen = ProbDistContainer({i: uniform_dist(-6, 6) for i in range(NDIM)})
    move = MTDistGenMove({"model_0": gen}, num_try=10, independent=True)
    ens = EnsembleSampler(
        NWALKERS,
        NDIM,
        log_like,
        priors,
        moves=[move],
        tempering_kwargs=dict(ntemps=3),
        seed=12,
    )
    coords = priors.rvs(size=(3, NWALKERS))
    ens.run_mcmc(coords, 500, burn=200)
    chain = ens.get_chain()["model_0"][:, 0].reshape(-1, NDIM)
    assert np.abs(chain.mean(axis=0)).max() < 0.25
    assert np.abs(chain.std(axis=0) - 1.0).max() < 0.25
    # multiple tries from a broad prior should still mix decently
    assert ens.acceptance_fraction.mean() > 0.1


def test_mt_distgen_nonindependent_unbiased(priors):
    """Regression: independent=False with a *non-uniform* generator must keep
    detailed balance.  Previously the auxiliary set substituted the current
    point into the tries but kept the discarded draw's proposal logpdf, which
    biased the chain toward the generator's mean (N(1.5, 1.2) generator over
    an N(0,1) target gave mean ~ +0.16)."""
    gen = ProbDistContainer({i: normal_dist(1.5, 1.2) for i in range(NDIM)})
    move = MTDistGenMove({"model_0": gen}, num_try=8, independent=False)
    ens = EnsembleSampler(
        NWALKERS,
        NDIM,
        log_like,
        priors,
        moves=[move],
        seed=21,
    )
    coords = 0.1 * np.random.randn(NWALKERS, NDIM)
    ens.run_mcmc(coords, 800, burn=300)
    chain = ens.get_chain()["model_0"].reshape(-1, NDIM)
    assert np.abs(chain.mean(axis=0)).max() < 0.08
    assert np.abs(chain.std(axis=0) - 1.0).max() < 0.15


def test_mt_state_dependent_generator(priors):
    """Regression: with ``independent=False`` and a genuinely state-DEPENDENT
    asymmetric generator, the auxiliary try set must be anchored on the
    *chosen* point (standard MTM, Liu/Liang/Wong 2000).  Previously the
    auxiliary draws came from the OLD point's generator, which breaks
    detailed balance for any state-dependent proposal."""
    import jax

    rho, shift, sig = 0.7, 0.5, 1.0
    log2pi = float(np.log(2 * np.pi))

    class ARGenMT(MTDistGenMove):
        """Tries ~ N(rho * x + shift, sig^2) — asymmetric, anchored on the
        current coordinates of the target branch."""

        def _mean(self, state):
            return rho * state.branches[self.key_in].coords[:, :, 0] + shift

        def special_generate_kernel(self, key, state, num_try):
            mean = self._mean(state)
            nt, nw, ndim = mean.shape
            eps = jax.random.normal(
                key, (nt, nw, num_try, ndim), dtype=mean.dtype
            )
            tries = mean[:, :, None, :] + sig * eps
            d = (tries - mean[:, :, None, :]) / sig
            logq = -0.5 * jnp.sum(
                d**2 + log2pi + 2 * jnp.log(sig), axis=-1
            )
            return tries, logq

        def special_generate_logpdf_kernel(self, state, coords=None):
            mean = self._mean(state)
            if coords is None:
                coords = state.branches[self.key_in].coords[:, :, 0]
            d = (coords - mean) / sig
            return -0.5 * jnp.sum(d**2 + log2pi + 2 * jnp.log(sig), axis=-1)

    gen = ProbDistContainer({i: normal_dist(0.0, 1.0) for i in range(NDIM)})
    move = ARGenMT({"model_0": gen}, num_try=6, independent=False)
    ens = EnsembleSampler(
        NWALKERS,
        NDIM,
        log_like,
        priors,
        moves=[move],
        seed=31,
    )
    coords = 0.1 * np.random.randn(NWALKERS, NDIM)
    ens.run_mcmc(coords, 900, burn=300)
    chain = ens.get_chain()["model_0"].reshape(-1, NDIM)
    assert np.abs(chain.mean(axis=0)).max() < 0.08
    assert np.abs(chain.std(axis=0) - 1.0).max() < 0.12


def test_mt_rj_mixin_select_raises():
    """The generic MultipleTryMoveRJ mixin must fail loudly if its in-model
    selection kernel is invoked: the RJ factor bookkeeping (death-try
    inversion, one-less-leaf auxiliary base) lives in MTDistGenMoveRJ."""
    from eryn_tpu.moves.multipletry import MultipleTryMoveRJ

    move = MultipleTryMoveRJ(num_try=2)
    assert move.mt_rj
    with pytest.raises(NotImplementedError, match="MTDistGenMoveRJ"):
        move.mt_select_kernel(None, None, None)


def test_mt_rj(priors):
    """MT-RJ on the pulse-count problem: should find the single pulse."""
    rng = np.random.default_rng(5)
    t_np = np.linspace(0, 10, 100)
    sigma = 0.3
    data_np = 3.0 * np.exp(-((t_np - 5.0) ** 2) / (2 * 0.7**2))
    data_np = data_np + sigma * rng.standard_normal(len(t_np))
    t, data = jnp.asarray(t_np), jnp.asarray(data_np)

    def ll(coords, inds):
        a, b, c = coords[:, 0], coords[:, 1], coords[:, 2]
        p = a[:, None] * jnp.exp(
            -((t[None] - b[:, None]) ** 2) / (2 * c[:, None] ** 2)
        )
        tmpl = jnp.sum(jnp.where(inds[:, None], p, 0.0), axis=0)
        return -0.5 * jnp.sum(((tmpl - data) / sigma) ** 2)

    pr = ProbDistContainer(
        {
            0: uniform_dist(0.5, 5.0),
            1: uniform_dist(0.0, 10.0),
            2: uniform_dist(0.2, 2.0),
        }
    )
    nlmax = 2
    rj_move = MTDistGenMoveRJ(
        {"model_0": pr},
        nleaves_max={"model_0": nlmax},
        nleaves_min={"model_0": 0},
        num_try=8,
    )
    ens = EnsembleSampler(
        NWALKERS,
        3,
        ll,
        pr,
        nleaves_max=nlmax,
        nleaves_min=0,
        rj_moves=[rj_move],
        tempering_kwargs=dict(ntemps=3),
        fill_zero_leaves_val=float(-0.5 * np.sum((data_np / sigma) ** 2)),
        seed=13,
    )
    coords = pr.rvs(size=(3, NWALKERS, nlmax))
    inds = np.random.rand(3, NWALKERS, nlmax) < 0.5
    ens.run_mcmc(State({"model_0": coords}, inds={"model_0": inds}), 300, burn=200)
    nleaves = ens.get_nleaves()["model_0"][:, 0]
    assert nleaves.mean() > 0.9
    assert ens.rj_acceptance_fraction is not None


def test_delayed_rejection(priors):
    inner = GaussianMove({"model_0": 2.5 * np.ones(NDIM)})
    move = DelayedRejection(inner, max_iter=3)
    ens = EnsembleSampler(NWALKERS, NDIM, log_like, priors, moves=[move], seed=14)
    coords = 0.1 * np.random.randn(NWALKERS, NDIM)
    ens.run_mcmc(coords, 500, burn=200)
    chain = ens.get_chain()["model_0"].reshape(-1, NDIM)
    assert np.abs(chain.mean(axis=0)).max() < 0.3
    assert np.abs(chain.std(axis=0) - 1.0).max() < 0.3
    # DR should accept more than the bare wide Gaussian would
    plain = EnsembleSampler(
        NWALKERS,
        NDIM,
        log_like,
        priors,
        moves=[GaussianMove({"model_0": 2.5 * np.ones(NDIM)})],
        seed=14,
    )
    plain.run_mcmc(0.1 * np.random.randn(NWALKERS, NDIM), 300, burn=100)
    assert ens.acceptance_fraction.mean() > plain.acceptance_fraction.mean()
