"""Product-space model comparison (ModelSwapRJMove): the posterior model
indicator must reproduce brute-force quadrature Bayes factors — the
reference's own roadmap item (docs/source/general/todos.rst) whose move its
stale example still imports as BasicSymmetricModelSwapRJMove."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist
from eryn_tpu.moves import (
    BasicSymmetricModelSwapRJMove,
    GaussianMove,
    ModelSwapRJMove,
)

NW = 64


def _setup():
    """Data: a Gaussian pulse. Model A: pulse with free amplitude.
    Model B: constant offset. Both 1-D -> evidences by quadrature."""
    rng = np.random.default_rng(4)
    npts = 64
    t = np.linspace(0, 1, npts)
    g = np.exp(-((t - 0.5) ** 2) / (2 * 0.1**2))
    sigma = 1.0
    data = 1.1 * g + sigma * rng.standard_normal(npts)
    amax = 3.0

    def ll_np(template):
        return -0.5 * np.sum(
            ((data[None] - template) / sigma) ** 2, axis=-1
        )

    a = np.linspace(0.0, amax, 800)
    z_pulse = np.exp(ll_np(a[:, None] * g[None])).mean()
    c = np.linspace(-1.0, 1.0, 800)
    z_const = np.exp(ll_np(np.broadcast_to(c[:, None], (800, npts)))).mean()
    p_pulse_true = z_pulse / (z_pulse + z_const)

    g_j, d_j = jnp.asarray(g), jnp.asarray(data)

    def log_like(coords, inds):
        amp = jnp.sum(jnp.where(inds["pulse"][:, None], coords["pulse"], 0.0))
        off = jnp.sum(jnp.where(inds["const"][:, None], coords["const"], 0.0))
        template = amp * g_j + off
        return -0.5 * jnp.sum(((d_j - template) / sigma) ** 2)

    priors = {
        "pulse": ProbDistContainer({0: uniform_dist(0.0, amax)}),
        "const": ProbDistContainer({0: uniform_dist(-1.0, 1.0)}),
    }
    return log_like, priors, p_pulse_true


def _initial_state(priors, ntemps=1):
    rng = np.random.default_rng(7)
    coords = {
        n: np.asarray(c.rvs(size=(ntemps, NW, 1)))
        for n, c in priors.items()
    }
    pick = rng.random((ntemps, NW)) < 0.5
    inds = {
        "pulse": pick[..., None],
        "const": ~pick[..., None],
    }
    return State(coords, inds=inds)


def test_model_swap_matches_quadrature_bayes_factor():
    log_like, priors, p_true = _setup()
    swap = ModelSwapRJMove(
        {n: priors[n] for n in ("pulse", "const")}
    )
    ens = EnsembleSampler(
        NW,
        {"pulse": 1, "const": 1},
        log_like,
        priors,
        branch_names=["pulse", "const"],
        nleaves_max={"pulse": 1, "const": 1},
        nleaves_min={"pulse": 0, "const": 0},
        moves=[GaussianMove({"pulse": 0.05, "const": 0.05})],
        rj_moves=[swap],
        fill_zero_leaves_val=-1e8,
        seed=21,
    )
    ens.run_mcmc(_initial_state(priors), 4000, burn=500)
    nl = ens.get_nleaves()
    active_pulse = nl["pulse"][:, 0]
    # product-space invariant holds throughout
    assert np.all(active_pulse + nl["const"][:, 0] == 1)
    p_pulse = active_pulse.mean()
    assert abs(p_pulse - p_true) < 0.05, (p_pulse, p_true)
    # within-model posterior is still sampled correctly: amplitude near 1.1
    chain = ens.get_chain()["pulse"][:, 0, :, 0, 0]
    m = ens.get_inds()["pulse"][:, 0, :, 0]
    assert abs(np.median(chain[m]) - 1.1) < 0.3


def test_model_swap_validation_and_alias():
    # the reference example's name is a subclass that ALSO accepts the
    # legacy (nleaves_max, nleaves_min) positional form with the candidate
    # distributions resolved from the sampler's priors at wiring time
    assert issubclass(BasicSymmetricModelSwapRJMove, ModelSwapRJMove)
    legacy = BasicSymmetricModelSwapRJMove([1, 1], [0, 0])
    assert legacy.generate_dist is None
    pr_a = ProbDistContainer({0: uniform_dist(0, 1)})
    pr_b = ProbDistContainer({0: uniform_dist(0, 2)})
    legacy.wire_sampler_priors({"a": pr_a, "b": pr_b})
    assert legacy.model_names == ["a", "b"]
    assert legacy.nleaves_max == {"a": 1, "b": 1}
    with pytest.raises(ValueError, match="nleaves_max == 1"):
        BasicSymmetricModelSwapRJMove([2, 1], [0, 0])
    pr = ProbDistContainer({0: uniform_dist(0, 1)})
    with pytest.raises(ValueError, match="at least two"):
        ModelSwapRJMove({"only": pr})
    with pytest.raises(ValueError, match="at least two"):
        ModelSwapRJMove(pr)

    # exactly-one-active invariant is validated on the first concrete state
    log_like, priors, _ = _setup()
    swap = ModelSwapRJMove({n: priors[n] for n in ("pulse", "const")})
    ens = EnsembleSampler(
        NW,
        {"pulse": 1, "const": 1},
        log_like,
        priors,
        branch_names=["pulse", "const"],
        nleaves_max={"pulse": 1, "const": 1},
        nleaves_min={"pulse": 0, "const": 0},
        moves=[GaussianMove({"pulse": 0.05, "const": 0.05})],
        rj_moves=[swap],
        fill_zero_leaves_val=-1e8,
        seed=22,
    )
    bad = State(
        {
            n: np.asarray(priors[n].rvs(size=(1, NW, 1)))
            for n in ("pulse", "const")
        },
        inds={
            "pulse": np.ones((1, NW, 1), bool),
            "const": np.ones((1, NW, 1), bool),  # both active: invalid
        },
    )
    with pytest.raises(ValueError, match="exactly one active"):
        ens.run_mcmc(bad, 2)


def test_model_swap_with_tempering():
    """PT composes with product-space switching; also a regression for the
    State.replace branch-order canonicalization (jax.tree_map sorts dict
    keys, so non-alphabetical branch names — 'pulse' > 'const' — would
    reorder the scan carry's pytree after the tempering gather)."""
    log_like, priors, p_true = _setup()
    swap = ModelSwapRJMove({n: priors[n] for n in ("pulse", "const")})
    ens = EnsembleSampler(
        NW,
        {"pulse": 1, "const": 1},
        log_like,
        priors,
        branch_names=["pulse", "const"],
        nleaves_max={"pulse": 1, "const": 1},
        nleaves_min={"pulse": 0, "const": 0},
        moves=[GaussianMove({"pulse": 0.05, "const": 0.05})],
        rj_moves=[swap],
        tempering_kwargs=dict(ntemps=3),
        fill_zero_leaves_val=-1e8,
        seed=23,
    )
    ens.run_mcmc(_initial_state(priors, ntemps=3), 800, burn=200)
    nl = ens.get_nleaves()
    # invariant survives temperature swaps on every rung
    assert np.all(nl["pulse"] + nl["const"] == 1)
    # cold chain still tracks the quadrature Bayes factor (looser: shorter run)
    p_pulse = nl["pulse"][:, 0].mean()
    assert abs(p_pulse - p_true) < 0.1, (p_pulse, p_true)


def test_model_swap_blobs_and_kwarg_guards():
    """Blobs follow accepted model switches; split kwargs are refused."""
    log_like, priors, _ = _setup()

    def ll_blob(coords, inds):
        ll = log_like(coords, inds)
        # blob: which model is active (1 = pulse)
        return ll, jnp.array([jnp.sum(jnp.where(inds["pulse"], 1.0, 0.0))])

    with pytest.raises(ValueError, match="jointly"):
        ModelSwapRJMove(
            {n: priors[n] for n in ("pulse", "const")},
            proposal_branch_names=["pulse"],
        )

    swap = ModelSwapRJMove({n: priors[n] for n in ("pulse", "const")})
    ens = EnsembleSampler(
        NW,
        {"pulse": 1, "const": 1},
        ll_blob,
        priors,
        branch_names=["pulse", "const"],
        nleaves_max={"pulse": 1, "const": 1},
        nleaves_min={"pulse": 0, "const": 0},
        moves=[GaussianMove({"pulse": 0.05, "const": 0.05})],
        rj_moves=[swap],
        fill_zero_leaves_val=-1e8,
        seed=24,
    )
    ens.run_mcmc(_initial_state(priors), 200)
    blobs = ens.get_blobs()[..., 0]
    active = ens.get_nleaves()["pulse"].astype(float)
    np.testing.assert_allclose(blobs, active)


def test_model_swap_alias_keyword_signature():
    """The primary {branch: dist} signature must also work as a keyword
    through the alias class (it routes through the legacy-arg parser)."""
    pr_a = ProbDistContainer({0: uniform_dist(0, 1)})
    pr_b = ProbDistContainer({0: uniform_dist(0, 2)})
    mv = BasicSymmetricModelSwapRJMove(generate_dist={"a": pr_a, "b": pr_b})
    assert mv.model_names == ["a", "b"]
    assert mv.nleaves_max == {"a": 1, "b": 1}
