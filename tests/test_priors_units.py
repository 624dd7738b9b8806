"""Unit tests for the prior distributions and small utilities."""

import numpy as np
import pytest
from scipy import stats

import jax
import jax.numpy as jnp

from eryn_tpu.prior import (
    LogUniformDistribution,
    MappedUniformDistribution,
    NormalDistribution,
    ProbDistContainer,
    log_uniform,
    uniform_dist,
)
from eryn_tpu.utils.utility import get_integrated_act, groups_from_inds, psrf


def test_uniform_distribution():
    d = uniform_dist(-2.0, 3.0)
    x = np.array([-3.0, 0.0, 2.9, 3.1])
    np.testing.assert_allclose(
        np.asarray(d.logpdf(x)),
        stats.uniform(-2, 5).logpdf(x),
    )
    samples = d.rvs(size=5000)
    assert samples.min() >= -2.0 and samples.max() <= 3.0
    assert abs(samples.mean() - 0.5) < 0.1
    # keyed traced sampling
    s2 = d.sample(jax.random.PRNGKey(0), (1000,))
    assert float(s2.min()) >= -2.0 and float(s2.max()) <= 3.0
    # reversed bounds are swapped like the reference
    d2 = uniform_dist(3.0, -2.0)
    assert d2.min_val == -2.0 and d2.max_val == 3.0
    with pytest.raises(ValueError):
        uniform_dist(1.0, 1.0)


def test_log_uniform():
    d = log_uniform(0.1, 10.0)
    assert isinstance(d, LogUniformDistribution)
    x = np.array([0.05, 0.5, 5.0, 20.0])
    expected = stats.loguniform(0.1, 10.0).logpdf(x)
    np.testing.assert_allclose(np.asarray(d.logpdf(x)), expected, rtol=1e-6)
    s = np.asarray(d.sample(jax.random.PRNGKey(1), (20000,)))
    assert 0.1 <= s.min() and s.max() <= 10.0
    # log-uniform: log(s) is uniform
    ls = np.log(s)
    assert abs(ls.mean() - (np.log(0.1) + np.log(10)) / 2) < 0.05


def test_mapped_uniform():
    d = MappedUniformDistribution(2.0, 6.0)
    x = np.array([1.0, 2.5, 6.0, 7.0])
    lp = np.asarray(d.logpdf(x))
    assert lp[0] == -np.inf and lp[3] == -np.inf
    assert lp[1] == 0.0 and lp[2] == 0.0
    s = d.rvs(size=1000)
    assert s.min() >= 2.0 and s.max() <= 6.0


def test_normal_distribution():
    d = NormalDistribution(1.0, 2.0)
    x = np.linspace(-5, 7, 13)
    np.testing.assert_allclose(
        np.asarray(d.logpdf(x)), stats.norm(1.0, 2.0).logpdf(x), rtol=1e-5
    )
    q = np.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(d.ppf(q)), stats.norm(1.0, 2.0).ppf(q), rtol=1e-4
    )


def test_container_string_keys():
    pc = ProbDistContainer(
        {"amp": uniform_dist(0, 1), "freq": uniform_dist(1, 2)}
    )
    assert pc.key_order == ["amp", "freq"]
    assert pc.ndim == 2
    x = np.array([[0.5, 1.5]])
    assert np.isfinite(np.asarray(pc.logpdf(x))).all()
    # rvs with keys filter
    s = pc.rvs(size=10)
    assert s.shape == (10, 2)


def test_container_logpdf_batch_shapes():
    pc = ProbDistContainer({i: uniform_dist(-1, 1) for i in range(3)})
    for shape in [(3,), (5, 3), (2, 4, 3), (2, 3, 4, 3)]:
        x = np.zeros(shape)
        assert np.asarray(pc.logpdf(x)).shape == shape[:-1]


def test_groups_from_inds():
    inds = {
        "m": np.array(
            [[[True, False], [True, True]], [[False, False], [True, False]]]
        )
    }
    groups = groups_from_inds(inds)["m"]
    # walker flat ids: t0w0=0, t0w1=1, t1w0=2, t1w1=3
    np.testing.assert_array_equal(groups, [0, 1, 1, 3])


def test_integrated_act_known_chain():
    rng = np.random.default_rng(0)
    # AR(1) with rho: IACT = (1+rho)/(1-rho)
    rho = 0.7
    n = 40000
    x = np.zeros(n)
    e = rng.standard_normal(n)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + e[i]
    tau = get_integrated_act(x[:, None])
    expected = (1 + rho) / (1 - rho)
    assert abs(tau - expected) / expected < 0.25


def test_psrf_converged_vs_not():
    rng = np.random.default_rng(1)
    good = rng.standard_normal((500, 8, 2))
    bad = good.copy()
    bad[:, :4] += 5.0  # half the walkers stuck elsewhere
    assert np.all(psrf(good, 2) < 1.1)
    assert np.all(psrf(bad, 2) > 1.5)


def test_walkers_independent():
    from eryn_tpu import walkers_independent

    rng = np.random.default_rng(2)
    good = rng.standard_normal((50, 5))
    assert walkers_independent(good)
    # degenerate: all walkers identical in one dimension
    bad = good.copy()
    bad[:, 2] = 1.25  # exactly representable -> exact zero column after centering
    assert not walkers_independent(bad)
    # non-finite coordinates
    nan = good.copy()
    nan[0, 0] = np.nan
    assert not walkers_independent(nan)


def test_integrated_act_nan_leaf_columns():
    """An RJ leaf that never activates in SOME walker must not NaN the
    walker-averaged tau for that parameter (all-walker-NaN stays NaN)."""
    rng = np.random.default_rng(3)
    nsteps, nwalkers = 200, 4
    x = rng.standard_normal((nsteps, 1, nwalkers, 2, 1))
    x[:, :, 3, 1, :] = np.nan  # leaf 1 never active in walker 3
    tau = get_integrated_act({"m": x})["m"]
    assert tau.shape == (1, 2, 1)
    assert np.isfinite(tau).all()

    x[:, :, :, 1, :] = np.nan  # leaf 1 never active anywhere
    tau = get_integrated_act({"m": x})["m"]
    assert np.isfinite(tau[0, 0, 0])
    assert np.isnan(tau[0, 1, 0])


def test_bare_logpdf_prior_accepted():
    """Regression: priors dict values may be bare distribution objects with
    .logpdf over the branch's full parameter vector (e.g. a scipy frozen
    multivariate), as the reference's priors setter allows
    (ref ensemble.py:740-742)."""
    from scipy import stats

    from eryn_tpu import EnsembleSampler

    def ll(x):
        return -0.5 * jnp.sum(x**2)

    ens = EnsembleSampler(
        16,
        2,
        ll,
        {"model_0": stats.multivariate_normal(np.zeros(2), np.eye(2))},
        seed=17,
    )
    coords = 0.5 * np.random.randn(16, 2)
    ens.run_mcmc(coords, 20)
    assert ens.backend.iteration == 20
    assert np.isfinite(np.asarray(ens.get_log_prior())).all()


def test_prior_container_rejects_overlapping_indices():
    from eryn_tpu.prior import MultivariateNormalDistribution

    mvn = MultivariateNormalDistribution(np.zeros(2), np.eye(2))
    with pytest.raises(ValueError, match="overlap"):
        ProbDistContainer({(0, 1): mvn, 1: uniform_dist(-1, 1)})


def test_prior_rvs_sample_only_distribution():
    """rvs must draw through a traceable-protocol (sample/logpdf only)
    distribution instead of silently leaving the column at zero."""

    class SampleOnly:
        def sample(self, key, shape):
            import jax

            return 3.0 + 0.0 * jax.random.uniform(key, shape)

        def logpdf(self, x):
            return jnp.zeros(jnp.asarray(x).shape)

    c = ProbDistContainer({0: SampleOnly(), 1: uniform_dist(-1, 1)})
    draws = c.rvs(size=200)
    np.testing.assert_allclose(draws[:, 0], 3.0)
    assert np.abs(draws[:, 1]).max() <= 1.0


def test_bad_rvs_distribution_raises():
    class NoDraw:
        def logpdf(self, x):
            return 0.0

    c = ProbDistContainer({0: NoDraw()})
    with pytest.raises(TypeError, match="neither rvs nor sample"):
        c.rvs(size=4)


def test_container_ppf():
    """ProbDistContainer.ppf (unimplemented in the reference,
    ref prior.py:394-405): per-parameter quantile transform for stratified
    walker initialization."""
    import numpy as np
    import pytest
    from scipy import stats

    from eryn_tpu.prior import (
        ProbDistContainer,
        mvn_dist,
        normal_dist,
        uniform_dist,
    )

    pr = ProbDistContainer(
        {0: uniform_dist(-2.0, 4.0), 1: normal_dist(1.0, 2.0)}
    )
    q = np.random.rand(50, 2)
    out = pr.ppf(q)
    np.testing.assert_allclose(out[:, 0], -2.0 + 6.0 * q[:, 0], rtol=1e-10)
    np.testing.assert_allclose(
        out[:, 1], stats.norm(1.0, 2.0).ppf(q[:, 1]), rtol=1e-4, atol=1e-5
    )
    # keys= restricts the transform
    out2 = pr.ppf(q, keys=[0])
    np.testing.assert_allclose(out2[:, 0], out[:, 0])
    np.testing.assert_allclose(out2[:, 1], q[:, 1])
    # stratified init round-trips through logpdf support
    assert np.isfinite(np.asarray(pr.logpdf(out))).all()
    # multivariate keys have no coordinate-wise quantile fn
    pr2 = ProbDistContainer({(0, 1): mvn_dist(np.zeros(2), np.eye(2))})
    with pytest.raises(ValueError, match="per-parameter"):
        pr2.ppf(q)


def test_container_ppf_accepts_key_iterator():
    """keys= may be any iterable, including a one-shot generator (a
    consumed iterator must not silently deselect every entry)."""
    import numpy as np

    from eryn_tpu.prior import ProbDistContainer, uniform_dist

    pr = ProbDistContainer(
        {0: uniform_dist(-2.0, 4.0), 1: uniform_dist(0.0, 1.0)}
    )
    q = np.random.default_rng(0).random((20, 2))
    out_list = pr.ppf(q, keys=[0])
    out_gen = pr.ppf(q, keys=iter([0]))
    np.testing.assert_allclose(out_gen, out_list)
    # the selected column was actually transformed
    np.testing.assert_allclose(out_gen[:, 0], -2.0 + 6.0 * q[:, 0])


def test_rvs_stratified_latin_hypercube():
    """Each parameter's N stratified draws occupy the N equal-probability
    quantile strata exactly once; shapes/reproducibility/multivariate
    fallback all behave."""
    from eryn_tpu.prior import (
        MultivariateNormalDistribution,
        ProbDistContainer,
        normal_dist,
        uniform_dist,
    )

    pr = ProbDistContainer(
        {0: uniform_dist(-2.0, 6.0), 1: normal_dist(1.0, 3.0)}
    )
    n = 64
    x = pr.rvs_stratified(size=n, seed=5)
    assert x.shape == (n, 2)
    # uniform marginal: exactly one sample per stratum
    q0 = (x[:, 0] + 2.0) / 8.0
    counts = np.histogram(q0, bins=n, range=(0.0, 1.0))[0]
    assert (counts == 1).all()
    # normal marginal: push through the CDF, same property
    from scipy.stats import norm

    q1 = norm.cdf(x[:, 1], loc=1.0, scale=3.0)
    counts1 = np.histogram(q1, bins=n, range=(0.0, 1.0))[0]
    assert (counts1 == 1).all()
    # reproducible with a seed; tuple sizes reshape
    np.testing.assert_array_equal(x, pr.rvs_stratified(size=n, seed=5))
    y = pr.rvs_stratified(size=(4, 16), seed=6)
    assert y.shape == (4, 16, 2)

    # multivariate blocks fall back to iid draws but keep positions
    cov = np.array([[1.0, 0.5], [0.5, 2.0]])
    pr2 = ProbDistContainer(
        {
            0: uniform_dist(0.0, 1.0),
            (1, 2): MultivariateNormalDistribution(np.zeros(2), cov),
        }
    )
    z = pr2.rvs_stratified(size=1024, seed=7)
    assert z.shape == (1024, 3)
    qz = z[:, 0]
    assert (np.histogram(qz, bins=1024, range=(0.0, 1.0))[0] == 1).all()
    emp = np.cov(z[:, 1:].T)
    np.testing.assert_allclose(emp, cov, atol=0.3)
    # the multivariate fallback is seeded too
    np.testing.assert_array_equal(z, pr2.rvs_stratified(size=1024, seed=7))
    # every stratified start is inside the prior support
    assert np.isfinite(pr2.logpdf(z)).all()
