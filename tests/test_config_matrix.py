"""Feature-combination smoke matrix: configurations mixing branches, moves,
tempering, RJ, Gibbs, periodic parameters, blobs, and thinning that no other
test combines — every cell must compile, run, store, and resume cleanly
(analog of the reference's everything-is-an-end-to-end-run strategy,
ref tests/test_eryn.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist
from eryn_tpu.moves import (
    CombineMove,
    DistributionGenerate,
    GaussianMove,
    GroupStretchMove,
    StretchMove,
)

NW = 32


def _gauss_priors(ndim, lim=5.0):
    return ProbDistContainer({i: uniform_dist(-lim, lim) for i in range(ndim)})


def test_multibranch_mixed_moves_blobs_thin():
    """Two branches with different ndim, weighted CombineMove schedule,
    blobs, PT, and thin_by."""
    priors = {"gauss": _gauss_priors(3), "sine": _gauss_priors(2)}

    def ll(coords, inds):
        g = coords["gauss"][0]  # (nleaves=1 -> leaf 0)
        s = coords["sine"][0]
        val = -0.5 * (jnp.sum(g**2) + jnp.sum(s**2))
        return val, jnp.stack([val, jnp.sum(g)])

    moves = [
        (StretchMove(), 0.6),
        (
            CombineMove(
                [
                    GaussianMove(
                        {"gauss": 0.3 * np.ones(3), "sine": 0.3 * np.ones(2)}
                    ),
                    DistributionGenerate(
                        {"gauss": _gauss_priors(3), "sine": _gauss_priors(2)}
                    ),
                ]
            ),
            0.4,
        ),
    ]
    ens = EnsembleSampler(
        NW,
        {"gauss": 3, "sine": 2},
        ll,
        priors,
        branch_names=["gauss", "sine"],
        moves=moves,
        tempering_kwargs=dict(ntemps=4),
        num_repeats_in_model=2,
        seed=51,
    )
    coords = {
        "gauss": priors["gauss"].rvs(size=(4, NW)),
        "sine": priors["sine"].rvs(size=(4, NW)),
    }
    ens.run_mcmc(coords, 60, burn=30, thin_by=2)
    assert ens.backend.iteration == 60
    blobs = ens.get_blobs()
    assert blobs.shape == (60, 4, NW, 2)
    assert np.isfinite(ens.get_log_like()).all()
    chain = ens.get_chain()
    assert chain["gauss"].shape == (60, 4, NW, 1, 3)
    assert chain["sine"].shape == (60, 4, NW, 1, 2)
    # resume continues from the previous state
    ens.run_mcmc(None, 20, thin_by=2)
    assert ens.backend.iteration == 80


def test_periodic_gibbs_group_stretch_rj():
    """Periodic parameter + leaf-level Gibbs masks + group stretch under RJ
    with nleaves_min > 0."""
    ndim, nlmax = 2, 3
    priors = ProbDistContainer(
        {0: uniform_dist(0.0, 2 * np.pi), 1: uniform_dist(-4.0, 4.0)}
    )

    def ll(coords, inds):
        # periodic dim 0, amplitude dim 1
        contrib = jnp.cos(coords[:, 0]) - 0.5 * coords[:, 1] ** 2
        return jnp.sum(jnp.where(inds, contrib, 0.0))

    mask = np.zeros((nlmax, ndim), dtype=bool)
    mask[:, 1] = True  # Gibbs: only dim 1 in one split
    move = GroupStretchMove(
        n_iter_update=10,
        gibbs_sampling_setup=[("model_0", None), ("model_0", mask)],
    )
    ens = EnsembleSampler(
        NW,
        ndim,
        ll,
        priors,
        nleaves_max=nlmax,
        nleaves_min=1,
        moves=[move],
        rj_moves=True,
        periodic={"model_0": {0: 2 * np.pi}},
        tempering_kwargs=dict(ntemps=3),
        fill_zero_leaves_val=-1e4,
        seed=52,
    )
    coords = priors.rvs(size=(3, NW, nlmax))
    inds = np.zeros((3, NW, nlmax), dtype=bool)
    inds[..., 0] = True
    inds[:, ::2, 1] = True
    ens.run_mcmc(State({"model_0": coords}, inds={"model_0": inds}), 80, burn=40)
    nleaves = ens.get_nleaves()["model_0"]
    assert nleaves.min() >= 1 and nleaves.max() <= nlmax
    # periodic dim stayed wrapped
    chain = ens.get_chain()["model_0"]
    m = ens.get_inds()["model_0"]
    active0 = chain[..., 0][m]
    assert active0.min() >= 0.0 and active0.max() <= 2 * np.pi
    assert np.isfinite(ens.get_log_like()).all()


def test_full_move_zoo_schedule():
    """Every concrete in-model move family in ONE weighted schedule with PT,
    blobs off, multibranch off — the maximal-coverage smoke cell."""
    from eryn_tpu.moves import (
        DEMove,
        DESnookerMove,
        HMCMove,
        KDEMove,
        MALAMove,
        WalkMove,
    )

    ndim = 3
    priors = _gauss_priors(ndim)
    moves = [
        (StretchMove(), 0.2),
        (DEMove(), 0.15),
        (DESnookerMove(), 0.1),
        (WalkMove(), 0.1),
        (KDEMove(), 0.1),
        (GaussianMove({"model_0": 0.1 * np.ones(ndim)}), 0.1),
        (MALAMove(eps=0.2), 0.15),
        (HMCMove(eps=0.2, num_leapfrog=(2, 5)), 0.1),
    ]
    ens = EnsembleSampler(
        64,
        ndim,
        lambda x: -0.5 * jnp.sum(x**2),
        priors,
        moves=moves,
        tempering_kwargs=dict(ntemps=4),
        seed=54,
    )
    coords = 0.5 * np.random.default_rng(54).standard_normal((4, 64, ndim))
    ens.run_mcmc(coords, 300, burn=100)
    chain = ens.get_chain()["model_0"][:, 0].reshape(-1, ndim)
    assert np.abs(chain.mean(axis=0)).max() < 0.3
    assert np.abs(chain.std(axis=0) - 1.0).max() < 0.3
    # every move family actually proposed and has sane acceptance
    for m in ens.moves:
        assert m.num_proposals > 0
        af = m.acceptance_fraction.mean()
        assert 0.01 < af < 0.99, (type(m).__name__, af)


def test_single_walker_temp_edge():
    """Tiny edge shapes: ntemps=2, minimum walkers for red/blue."""
    ndim = 2
    priors = _gauss_priors(ndim)
    ens = EnsembleSampler(
        4,
        ndim,
        lambda x: -0.5 * jnp.sum(x**2),
        priors,
        moves=[StretchMove(live_dangerously=True)],
        tempering_kwargs=dict(ntemps=2),
        seed=53,
    )
    ens.run_mcmc(priors.rvs(size=(2, 4)), 30)
    assert ens.backend.iteration == 30
    assert np.isfinite(ens.get_log_like()).all()
