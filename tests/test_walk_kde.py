"""WalkMove and KDEMove: posterior exactness on a correlated Gaussian,
PT compatibility, KDE factor correctness.  Both moves exist in the
reference only as commented-out imports (ref moves/__init__.py:3-23)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
from eryn_tpu.moves import KDEMove, StretchMove, WalkMove

NDIM = 3
NWALKERS = 64

_rho = 0.6
_COV = np.eye(NDIM) + _rho * (np.ones((NDIM, NDIM)) - np.eye(NDIM))
_ICOV_J = jnp.asarray(np.linalg.inv(_COV))


def log_like(x):
    return -0.5 * x @ (_ICOV_J @ x)


@pytest.fixture
def priors():
    return ProbDistContainer({i: uniform_dist(-10, 10) for i in range(NDIM)})


def _run(move, priors, nsteps=600, burn=400, ntemps=1, seed=13):
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
    assert np.abs(np.cov(chain.T) - _COV).max() < tol_cov


@pytest.mark.parametrize(
    "move_cls,kwargs",
    [
        (WalkMove, {}),
        (WalkMove, {"s0": 16}),
        (KDEMove, {}),
    ],
)
def test_walk_kde_posterior_exactness(move_cls, kwargs, priors):
    ens = _run(move_cls(**kwargs), priors)
    _check_cov(ens)
    af = ens.moves[0].acceptance_fraction.mean()
    assert 0.05 < af < 0.98, af


def test_walk_pt(priors):
    ens = _run(WalkMove(), priors, ntemps=4)
    _check_cov(ens)
    ll = ens.get_log_like()
    assert ll[:, 0].mean() > ll[:, -1].mean()


def test_kde_mixture_schedule(priors):
    moves = [(KDEMove(), 0.3), (StretchMove(), 0.7)]
    ens = _run(moves, priors)
    _check_cov(ens)


def test_kde_logpdf_matches_scipy():
    """The traced KDE density must match scipy's gaussian_kde exactly
    (same Scott bandwidth convention)."""
    from scipy.stats import gaussian_kde

    import jax

    rng = np.random.default_rng(0)
    nc, d, m = 50, 3, 7
    kernels = rng.standard_normal((nc, d))
    x = rng.standard_normal((m, d))

    mv = KDEMove()
    flat_c = jnp.asarray(kernels)[None]
    cov = jnp.asarray(np.cov(kernels.T, bias=False))[None]
    bw = nc ** (-1.0 / (d + 4))
    cov = cov * bw**2
    chol = jnp.linalg.cholesky(cov)
    eye = jnp.broadcast_to(jnp.eye(d), (1, d, d))
    chol_inv = jax.scipy.linalg.solve_triangular(
        chol, eye, lower=True
    ).transpose(0, 2, 1)
    logdet = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)), axis=-1
    )
    ours = np.asarray(
        mv._kde_logpdf(jnp.asarray(x)[None], flat_c, chol_inv, logdet, d)
    )[0]

    ref = gaussian_kde(kernels.T, bw_method="scott").logpdf(x.T)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_kde_too_few_walkers_raises(priors):
    ens = EnsembleSampler(
        8,
        NDIM,
        log_like,
        priors,
        moves=KDEMove(live_dangerously=True),
        seed=1,
    )
    # complement half has 4 walkers > NDIM=3 -> ok; squeeze to trigger
    ens2 = EnsembleSampler(
        6,
        NDIM,
        log_like,
        priors,
        moves=KDEMove(live_dangerously=True),
        seed=1,
    )
    with pytest.raises(ValueError, match="complement walkers"):
        ens2.run_mcmc(priors.rvs(size=(6,)), 2)


def test_walk_periodic_wraps(priors_p=None):
    """Regression: WalkMove must honor an injected PeriodicContainer —
    minimum-image deviations and wrapped proposals."""
    from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
    from eryn_tpu.moves import WalkMove

    P = 2 * np.pi
    pr = ProbDistContainer({0: uniform_dist(0, P), 1: uniform_dist(-5, 5)})

    def ll(x):
        return -0.5 * ((jnp.cos(x[0]) - 1.0) ** 2 / 0.01 + x[1] ** 2)

    ens = EnsembleSampler(
        32,
        2,
        ll,
        pr,
        moves=[WalkMove()],
        periodic={"model_0": {0: P}},
        seed=61,
    )
    coords = np.column_stack(
        [
            np.random.choice([0.05, P - 0.05], size=32),  # straddle the seam
            0.1 * np.random.randn(32),
        ]
    )
    ens.run_mcmc(coords, 300, burn=100)
    chain = ens.get_chain()["model_0"][..., 0]
    assert np.all(chain >= 0) and np.all(chain < P)
    # the seam-straddling mode keeps both sides populated (mixing across it)
    flat = chain.reshape(-1)
    assert (flat < 0.5).mean() > 0.05 and (flat > P - 0.5).mean() > 0.05
    assert float(np.mean(np.asarray(ens.acceptance_fraction))) > 0.05


def test_kde_rejects_periodic():
    from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
    from eryn_tpu.moves import KDEMove

    P = 2 * np.pi
    pr = ProbDistContainer({0: uniform_dist(0, P), 1: uniform_dist(-5, 5)})
    ens = EnsembleSampler(
        32,
        2,
        lambda x: -0.5 * jnp.sum(x**2),
        pr,
        moves=[KDEMove()],
        periodic={"model_0": {0: P}},
        seed=62,
    )
    with pytest.raises(ValueError, match="periodic"):
        ens.run_mcmc(np.asarray(pr.rvs(size=(32,))), 5)
