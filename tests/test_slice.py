"""Ensemble slice sampling (SliceMove, zeus-style): posterior exactness
on a strongly correlated Gaussian, mixing advantage over the stretch
move, PT, reversible-jump mask awareness, and periodic wrapping.  No
reference equivalent — pinned against analytic truth."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist
from eryn_tpu.moves import SliceMove, StretchMove
from eryn_tpu.utils.utility import get_integrated_act

NDIM = 3
NWALKERS = 64

_rho = 0.9
_COV = np.eye(NDIM) + _rho * (np.ones((NDIM, NDIM)) - np.eye(NDIM))
_ICOV_J = jnp.asarray(np.linalg.inv(_COV))


def log_like(x):
    return -0.5 * x @ (_ICOV_J @ x)


@pytest.fixture
def priors():
    return ProbDistContainer({i: uniform_dist(-10, 10) for i in range(NDIM)})


def _tau(chain):
    nsteps, nw, nl, nd = chain.shape
    return float(
        np.nanmax(
            get_integrated_act({"m": chain.reshape(nsteps, 1, nw, nl, nd)})["m"]
        )
    )


def test_posterior_exactness_and_mixing(priors):
    """Exact on a rho=0.9 Gaussian, always accepts, and mixes several
    times faster than the stretch move on the same budget."""
    ens = EnsembleSampler(
        NWALKERS, NDIM, log_like, priors, moves=SliceMove(), seed=5
    )
    coords = 0.5 * np.random.default_rng(5).standard_normal((NWALKERS, NDIM))
    ens.run_mcmc(coords, 500, burn=300)
    chain = ens.get_chain()["model_0"][:, 0]
    x = chain.reshape(-1, NDIM)
    assert np.abs(x.mean(axis=0)).max() < 0.1
    assert np.abs(np.cov(x.T) - _COV).max() < 0.35
    assert np.mean(ens.acceptance_fraction) > 0.95  # slice accepts

    st = EnsembleSampler(
        NWALKERS, NDIM, log_like, priors, moves=StretchMove(), seed=5
    )
    st.run_mcmc(coords, 500, burn=300)
    tau_slice = _tau(chain)
    tau_stretch = _tau(st.get_chain()["model_0"][:, 0])
    assert tau_slice < 0.6 * tau_stretch, (tau_slice, tau_stretch)


def test_pt(priors):
    ens = EnsembleSampler(
        NWALKERS, NDIM, log_like, priors, moves=SliceMove(),
        tempering_kwargs=dict(ntemps=4), seed=6,
    )
    coords = 0.5 * np.random.default_rng(6).standard_normal(
        (4, NWALKERS, NDIM)
    )
    ens.run_mcmc(coords, 300, burn=150)
    ll = ens.get_log_like()
    assert ll[:, 0].mean() > ll[:, -1].mean()


def test_rj_flat_likelihood_preserves_prior():
    """Flat likelihood + RJ: uniform k-posterior and exact prior moments
    for the active coordinates — dormant slots must never move."""
    nlmax, ndim = 2, 2
    pr = ProbDistContainer({i: uniform_dist(-1.0, 1.0) for i in range(ndim)})

    def ll(coords, inds):
        return jnp.zeros(())

    ens = EnsembleSampler(
        NWALKERS, ndim, ll, pr,
        nleaves_max=nlmax, nleaves_min=0,
        moves=SliceMove(),
        rj_moves=True,
        fill_zero_leaves_val=0.0,
        seed=7,
    )
    rng = np.random.default_rng(7)
    coords = pr.rvs(size=(1, NWALKERS, nlmax))
    inds = rng.random((1, NWALKERS, nlmax)) < 0.5
    state = State({"model_0": coords}, inds={"model_0": inds})
    ens.run_mcmc(state, 800, burn=200)

    chain = ens.get_chain()["model_0"][:, 0]
    inds_c = ens.get_inds()["model_0"][:, 0]
    k = inds_c.sum(axis=-1).ravel()
    freqs = np.bincount(k, minlength=nlmax + 1) / k.size
    assert np.abs(freqs - 1.0 / (nlmax + 1)).max() < 0.08, freqs
    act = chain[inds_c]
    assert abs(act.mean()) < 0.04
    assert abs(act.var() - 1.0 / 3.0) < 0.025


def test_periodic_wrap():
    pr = ProbDistContainer(
        {0: uniform_dist(0.0, 2 * np.pi), 1: uniform_dist(-5, 5)}
    )

    def ll_per(x):
        return -0.5 * ((jnp.cos(x[0]) - 1.0) ** 2 / 0.1 + x[1] ** 2)

    ens = EnsembleSampler(
        32, 2, ll_per, pr, moves=SliceMove(),
        periodic={"model_0": {0: 2 * np.pi}}, seed=10,
    )
    rng = np.random.default_rng(10)
    coords = np.column_stack(
        [rng.uniform(0, 2 * np.pi, 32), 0.3 * rng.standard_normal(32)]
    )
    ens.run_mcmc(coords, 200, burn=100)
    chain = ens.get_chain()["model_0"][:, 0, :, :, 0]
    assert (chain >= 0).all() and (chain <= 2 * np.pi).all()


def test_mu_tunes_and_freezes(priors):
    """mu adapts away from a bad init during tune_steps, then freezes."""
    move = SliceMove(mu=50.0, tune_steps=100)
    ens = EnsembleSampler(
        NWALKERS, NDIM, log_like, priors, moves=move, seed=11
    )
    coords = 0.5 * np.random.default_rng(11).standard_normal((NWALKERS, NDIM))
    ens.run_mcmc(coords, 150)
    ks = ens._kernel_states[0]
    mu = float(np.asarray(ks["mu"]))
    assert mu < 25.0, mu  # adapted down from the oversized init
    assert int(np.asarray(ks["t"])) == 150
    ens.run_mcmc(None, 30)
    mu2 = float(np.asarray(ens._kernel_states[0]["mu"]))
    assert mu2 == pytest.approx(mu)  # frozen after tune_steps


def test_nwalkers_guard(priors):
    ens = EnsembleSampler(3, NDIM, log_like, priors, moves=SliceMove(), seed=1)
    with pytest.raises(RuntimeError, match="complement"):
        ens.run_mcmc(np.zeros((3, NDIM)), 2)


def test_nsplits_one_guard(priors):
    """nsplits=1 leaves an empty complement — must raise, not emit
    garbage directions from undefined-range index draws."""
    ens = EnsembleSampler(
        8, NDIM, log_like, priors, moves=SliceMove(nsplits=1), seed=1
    )
    with pytest.raises(RuntimeError, match="complement"):
        ens.run_mcmc(np.zeros((8, NDIM)), 2)


def test_empty_walkers_sit_out():
    """Walkers with zero active leaves have an identically-zero slice
    direction: they must not count as accepted, and must not drain the
    expansion budget as phantom expansions that blow up the mu
    adaptation."""
    nlmax, ndim, nw = 2, 2, 32
    pr = ProbDistContainer({i: uniform_dist(-1.0, 1.0) for i in range(ndim)})

    def ll(coords, inds):
        return jnp.zeros(())

    move = SliceMove(tune_steps=150)
    ens = EnsembleSampler(
        nw, ndim, ll, pr,
        nleaves_max=nlmax, nleaves_min=0,
        moves=move,
        fill_zero_leaves_val=0.0,
        seed=13,
    )
    # no RJ moves: the leaf masks are frozen — half the walkers stay
    # permanently empty (k=0), half fully active
    coords = pr.rvs(size=(1, nw, nlmax))
    inds = np.zeros((1, nw, nlmax), dtype=bool)
    inds[:, nw // 2 :, :] = True
    state = State({"model_0": coords}, inds={"model_0": inds})
    ens.run_mcmc(state, 200)

    # per-walker acceptance: empty walkers never accepted, active ~always
    acc = np.asarray(ens.backend.accepted, dtype=float) / 200.0
    assert acc[0, : nw // 2].max() == 0.0, acc[0, : nw // 2]
    assert acc[0, nw // 2 :].min() > 0.9, acc[0, nw // 2 :]
    # mu adapted sanely: phantom expansions would grow it geometrically
    mu = float(np.asarray(ens._kernel_states[0]["mu"]))
    assert 0.01 < mu < 50.0, mu
