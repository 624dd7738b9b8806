"""Reference-style `vectorize=True` + `provide_groups` likelihood contract
(legacy NumPy callback bridge, `ensemble.py:1305-1406` semantics)."""

import numpy as np
import pytest

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist


def test_vectorized_groups_rj():
    rng = np.random.default_rng(2)
    t = np.linspace(0, 10, 64)
    sigma = 0.4
    data = 3.0 * np.exp(-((t - 5.0) ** 2) / (2 * 0.8**2))
    data = data + sigma * rng.standard_normal(len(t))

    calls = {"n": 0}

    def log_like(x, groups):
        # x: (total_active_leaves, 3); groups: flat walker id per leaf
        calls["n"] += 1
        nwalkers_here = groups.max() + 1 if len(groups) else 0
        templates = np.zeros((nwalkers_here, len(t)))
        for params, g in zip(x, groups):
            a, b, c = params
            templates[g] += a * np.exp(-((t - b) ** 2) / (2 * c**2))
        return -0.5 * np.sum(((templates - data) / sigma) ** 2, axis=-1)

    priors = ProbDistContainer(
        {
            0: uniform_dist(0.5, 5.0),
            1: uniform_dist(0.0, 10.0),
            2: uniform_dist(0.2, 2.0),
        }
    )
    nlmax = 2
    with pytest.warns(UserWarning, match="not JAX-traceable"):
        ens = EnsembleSampler(
            16,
            3,
            log_like,
            priors,
            nleaves_max=nlmax,
            nleaves_min=0,
            rj_moves=True,
            vectorize=True,
            provide_groups=True,
            fill_zero_leaves_val=float(-0.5 * np.sum((data / sigma) ** 2)),
            seed=41,
        )
    coords = priors.rvs(size=(1, 16, nlmax))
    inds = np.random.rand(1, 16, nlmax) < 0.7
    inds[..., 0] = True
    ens.run_mcmc(State({"model_0": coords}, inds={"model_0": inds}), 20, burn=5)
    assert calls["n"] > 0
    ll = ens.get_log_like()
    assert ll.shape == (20, 1, 16)
    assert np.all(np.isfinite(ll))
    # likelihood improves from the prior draw as the pulse is found
    assert ll[-1].max() > ll[0].max() - 1.0
