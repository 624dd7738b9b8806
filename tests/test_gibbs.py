"""Gibbs-split proposals (analog of
`/root/reference/tests/test_eryn.py:509-658`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
from eryn_tpu.moves import CombineMove, GaussianMove, StretchMove

NDIM = 4
NWALKERS = 40


def log_like(x):
    return -0.5 * jnp.sum(x**2)


@pytest.fixture
def priors():
    return ProbDistContainer({i: uniform_dist(-8, 8) for i in range(NDIM)})


def test_parameter_level_gibbs(priors):
    # split the 4 parameters into two gibbs iterations
    m1 = np.zeros((1, NDIM), dtype=bool)
    m1[:, :2] = True
    m2 = np.zeros((1, NDIM), dtype=bool)
    m2[:, 2:] = True
    move = GaussianMove(
        {"model_0": 0.8 * np.ones(NDIM)},
        gibbs_sampling_setup=[("model_0", m1), ("model_0", m2)],
    )
    ens = EnsembleSampler(NWALKERS, NDIM, log_like, priors, moves=[move], seed=6)
    coords = 0.1 * np.random.randn(NWALKERS, NDIM)
    ens.run_mcmc(coords, 400, burn=200)
    chain = ens.get_chain()["model_0"].reshape(-1, NDIM)
    assert np.abs(chain.mean(axis=0)).max() < 0.25
    assert np.abs(chain.std(axis=0) - 1.0).max() < 0.25


def test_gibbs_stretch_combined(priors):
    m1 = np.zeros((1, NDIM), dtype=bool)
    m1[:, ::2] = True
    m2 = ~m1
    move = CombineMove(
        [
            StretchMove(
                gibbs_sampling_setup=[("model_0", m1), ("model_0", m2)]
            ),
            GaussianMove(
                {"model_0": np.ones(NDIM)},
                gibbs_sampling_setup="model_0",
            ),
        ]
    )
    ens = EnsembleSampler(NWALKERS, NDIM, log_like, priors, moves=[move], seed=8)
    coords = 0.1 * np.random.randn(NWALKERS, NDIM)
    ens.run_mcmc(coords, 400, burn=200)
    chain = ens.get_chain()["model_0"].reshape(-1, NDIM)
    assert np.abs(chain.mean(axis=0)).max() < 0.25
    assert np.abs(chain.std(axis=0) - 1.0).max() < 0.25


def test_gibbs_bad_inputs():
    with pytest.raises(ValueError):
        StretchMove(gibbs_sampling_setup=42)
    with pytest.raises(ValueError):
        # 1D mask is invalid
        StretchMove(gibbs_sampling_setup=("model_0", np.ones(3, dtype=bool)))


def test_gibbs_accepted_or_across_iterations():
    """Regression: per-walker accepted flags accumulate (OR) across Gibbs
    iterations like the reference (red_blue.py:306-309) — a walker accepted
    in iteration 1 and rejected in iteration 2 counts as accepted, not as
    the last iteration's result."""
    from eryn_tpu.moves.red_blue import RedBlueMove

    class AcceptThenReject(RedBlueMove):
        """Identity proposal on branch 'a' (always accepts), out-of-support
        proposal on branch 'b' (always rejects)."""

        def get_proposal_kernel(
            self, key, s_coords, c_coords, s_inds, param_masks=None
        ):
            q = {}
            factors = None
            for n, c in s_coords.items():
                q[n] = c if n == "a" else c + 1e6
                factors = jnp.zeros(c.shape[:2], dtype=c.dtype)
            return q, factors

    priors = {
        "a": ProbDistContainer({i: uniform_dist(-8, 8) for i in range(2)}),
        "b": ProbDistContainer({i: uniform_dist(-8, 8) for i in range(2)}),
    }

    def ll(cdict, idict):
        return -0.5 * (
            jnp.sum(cdict["a"] ** 2) + jnp.sum(cdict["b"] ** 2)
        )

    move = AcceptThenReject(gibbs_sampling_setup=["a", "b"])
    ens = EnsembleSampler(
        32,
        {"a": 2, "b": 2},
        ll,
        priors,
        nbranches=2,
        branch_names=["a", "b"],
        moves=[move],
        seed=9,
    )
    coords = {
        "a": 0.1 * np.random.randn(32, 2),
        "b": 0.1 * np.random.randn(32, 2),
    }
    ens.run_mcmc(coords, 10)
    # iteration 'a' accepts every walker every step; iteration 'b' rejects
    # every walker; OR semantics -> acceptance fraction exactly 1
    assert float(np.min(ens.acceptance_fraction)) == 1.0
