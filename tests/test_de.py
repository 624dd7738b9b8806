"""Differential-evolution moves (DEMove, DESnookerMove): posterior
exactness on a correlated Gaussian, PT compatibility, and RJ-mask
awareness.  These moves exist in the reference only as commented-out
imports (ref moves/__init__.py:3-23); behavior is pinned against analytic
truth instead."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist
from eryn_tpu.moves import DEMove, DESnookerMove, StretchMove

NDIM = 3
NWALKERS = 64

# correlated Gaussian target: cov with off-diagonal structure
_rho = 0.7
_COV = np.eye(NDIM) + _rho * (np.ones((NDIM, NDIM)) - np.eye(NDIM))
_ICOV = np.linalg.inv(_COV)
_ICOV_J = jnp.asarray(_ICOV)


def log_like(x):
    return -0.5 * x @ (_ICOV_J @ x)


@pytest.fixture
def priors():
    return ProbDistContainer({i: uniform_dist(-10, 10) for i in range(NDIM)})


def _run(move, priors, nsteps=600, burn=400, ntemps=1, seed=9):
    kwargs = {}
    if ntemps > 1:
        kwargs["tempering_kwargs"] = dict(ntemps=ntemps)
    ens = EnsembleSampler(
        NWALKERS, NDIM, log_like, priors, moves=move, seed=seed, **kwargs
    )
    size = (ntemps, NWALKERS) if ntemps > 1 else (NWALKERS,)
    coords = 0.5 * np.random.default_rng(seed).standard_normal((*size, NDIM))
    ens.run_mcmc(coords, nsteps, burn=burn)
    return ens


def _check_cov(ens, tol_mean=0.25, tol_cov=0.5):
    chain = ens.get_chain()["model_0"][:, 0].reshape(-1, NDIM)
    assert np.abs(chain.mean(axis=0)).max() < tol_mean
    emp = np.cov(chain.T)
    assert np.abs(emp - _COV).max() < tol_cov, emp


@pytest.mark.parametrize("move_cls", [DEMove, DESnookerMove])
def test_de_posterior_exactness(move_cls, priors):
    ens = _run(move_cls(), priors)
    _check_cov(ens)
    af = ens.moves[0].acceptance_fraction.mean()
    assert 0.05 < af < 0.95, af


def test_de_pt(priors):
    ens = _run(DEMove(), priors, ntemps=6)
    _check_cov(ens)
    # ladder adapted and cold chain hotter in likelihood than hottest rung
    ll = ens.get_log_like()
    assert ll[:, 0].mean() > ll[:, -1].mean()


def test_de_snooker_mixture_with_stretch(priors):
    """The classic pairing: snooker + DE + stretch in one weighted schedule."""
    moves = [(DEMove(), 0.4), (DESnookerMove(), 0.2), (StretchMove(), 0.4)]
    ens = _run(moves, priors)
    _check_cov(ens)


def test_de_rj_masks():
    """DEMove under reversible jump: gamma0 adapts to per-walker active
    dimension counts and the k-posterior stays sane on a 0-or-1 pulse
    problem (config-C style)."""
    rng = np.random.default_rng(3)
    t = np.linspace(0, 8, 64)
    sigma = 0.4
    data = 2.5 * np.exp(-((t - 4.0) ** 2) / (2 * 0.5**2))
    data = data + sigma * rng.standard_normal(t.size)
    tj, dj = jnp.asarray(t), jnp.asarray(data)

    def ll(coords, inds):
        a, b, c = coords[:, 0], coords[:, 1], coords[:, 2]
        p = a[:, None] * jnp.exp(
            -((tj[None] - b[:, None]) ** 2) / (2 * c[:, None] ** 2)
        )
        tmpl = jnp.sum(jnp.where(inds[:, None], p, 0.0), axis=0)
        return -0.5 * jnp.sum(((tmpl - dj) / sigma) ** 2)

    pr = ProbDistContainer(
        {
            0: uniform_dist(0.5, 5.0),
            1: uniform_dist(0.0, 8.0),
            2: uniform_dist(0.1, 2.0),
        }
    )
    fill = float(-0.5 * np.sum((data / sigma) ** 2))
    ntemps, nmax = 4, 2
    ens = EnsembleSampler(
        NWALKERS,
        3,
        ll,
        pr,
        nleaves_max=nmax,
        nleaves_min=0,
        moves=DEMove(),
        rj_moves=True,
        tempering_kwargs=dict(ntemps=ntemps),
        fill_zero_leaves_val=fill,
        seed=12,
    )
    coords = pr.rvs(size=(ntemps, NWALKERS, nmax))
    inds = np.random.default_rng(5).random((ntemps, NWALKERS, nmax)) < 0.5
    state = State({"model_0": coords}, inds={"model_0": inds})
    ens.run_mcmc(state, 500, burn=300)
    nleaves = ens.get_nleaves()["model_0"][:, 0]
    # the signal is strong: k = 1 should dominate the cold chain
    frac_k1 = float((nleaves == 1).mean())
    assert frac_k1 > 0.6, frac_k1


def test_snooker_small_complement_raises():
    """A complement half with fewer than 3 walkers must fail loudly, not
    silently duplicate picks after index clamping."""
    pr = ProbDistContainer({0: uniform_dist(-5, 5)})
    ens = EnsembleSampler(
        4,
        1,
        lambda x: -0.5 * jnp.sum(x**2),
        pr,
        moves=DESnookerMove(live_dangerously=True),
        seed=2,
    )
    with pytest.raises(ValueError, match="at least 3 complement"):
        ens.run_mcmc(pr.rvs(size=(4,)), 2)


def test_snooker_periodic_wrap(priors):
    """Snooker geometry uses minimum-image differences and wraps proposals
    for periodic parameters."""
    from eryn_tpu.utils import PeriodicContainer

    periodic = PeriodicContainer({"model_0": {0: 2 * np.pi}})

    def ll_per(x):
        d0 = jnp.angle(jnp.exp(1j * (x[0] - jnp.pi / 2)))
        return -0.5 * (d0**2 / 0.3**2) - 0.5 * jnp.sum(x[1:] ** 2)

    pr = ProbDistContainer(
        {
            0: uniform_dist(0.0, 2 * np.pi),
            1: uniform_dist(-10, 10),
            2: uniform_dist(-10, 10),
        }
    )
    ens = EnsembleSampler(
        NWALKERS,
        3,
        ll_per,
        pr,
        moves=[(DESnookerMove(), 0.5), (StretchMove(), 0.5)],
        periodic=periodic,
        seed=6,
    )
    coords = pr.rvs(size=(NWALKERS,))
    ens.run_mcmc(coords, 400, burn=200)
    chain = ens.get_chain()["model_0"][:, 0].reshape(-1, 3)
    assert (chain[:, 0] >= 0).all() and (chain[:, 0] <= 2 * np.pi).all()
    mean_angle = np.angle(np.exp(1j * chain[:, 0]).mean())
    assert abs(mean_angle - np.pi / 2) < 0.2


def test_de_periodic_wrap(priors):
    """Periodic parameter stays in range through DE differences."""
    from eryn_tpu.utils import PeriodicContainer

    periodic = PeriodicContainer({"model_0": {0: 2 * np.pi}})

    def ll_per(x):
        # wrapped Gaussian on the circle centered at pi/2 + the usual
        # Gaussian on the rest
        d0 = jnp.angle(jnp.exp(1j * (x[0] - jnp.pi / 2)))
        return -0.5 * (d0**2 / 0.3**2) - 0.5 * jnp.sum(x[1:] ** 2)

    pr = ProbDistContainer(
        {
            0: uniform_dist(0.0, 2 * np.pi),
            1: uniform_dist(-10, 10),
            2: uniform_dist(-10, 10),
        }
    )
    ens = EnsembleSampler(
        NWALKERS, 3, ll_per, pr, moves=DEMove(), periodic=periodic, seed=4
    )
    coords = pr.rvs(size=(NWALKERS,))
    ens.run_mcmc(coords, 400, burn=200)
    chain = ens.get_chain()["model_0"][:, 0].reshape(-1, 3)
    assert (chain[:, 0] >= 0).all() and (chain[:, 0] <= 2 * np.pi).all()
    # circular mean near pi/2
    mean_angle = np.angle(np.exp(1j * chain[:, 0]).mean())
    assert abs(mean_angle - np.pi / 2) < 0.2
