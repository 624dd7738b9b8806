"""Statistical parity against the reference implementation (mikekatz04/Eryn,
mounted read-only at /root/reference) on the BASELINE configs.

The reference uses NumPy's Mersenne RNG and eryn_tpu uses JAX threefry keys,
so chains match statistically, not bitwise: we compare acceptance fractions,
posterior moments, swap-acceptance profiles, and adapted ladders.
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist


def _import_reference():
    sys.path.insert(0, "/root/reference/src")
    sys.modules.setdefault("corner", types.ModuleType("corner"))
    try:
        from eryn.ensemble import EnsembleSampler as RefSampler
        from eryn.prior import ProbDistContainer as RefContainer
        from eryn.prior import uniform_dist as ref_uniform
    except Exception:  # pragma: no cover
        pytest.skip("reference Eryn not importable")
    return RefSampler, RefContainer, ref_uniform


NDIM = 5
NWALKERS = 100
LIMS = 5.0
NSTEPS = 600
BURN = 200


def _run_reference(ntemps=1):
    RefSampler, RefContainer, ref_uniform = _import_reference()
    np.random.seed(42)
    invcov = np.eye(NDIM)

    def ll(x, icov):
        return -0.5 * (x * np.dot(icov, x.T).T).sum()

    priors = RefContainer({i: ref_uniform(-LIMS, LIMS) for i in range(NDIM)})
    kwargs = {}
    if ntemps > 1:
        kwargs["tempering_kwargs"] = dict(ntemps=ntemps)
    ens = RefSampler(NWALKERS, NDIM, ll, priors, args=[invcov], **kwargs)
    size = (ntemps, NWALKERS) if ntemps > 1 else (NWALKERS,)
    coords = priors.rvs(size=size)
    ens.run_mcmc(coords, NSTEPS, burn=BURN, progress=False)
    return ens


def _run_ours(ntemps=1):
    invcov = jnp.eye(NDIM)

    def ll(x):
        return -0.5 * jnp.sum(x * (invcov @ x))

    priors = ProbDistContainer({i: uniform_dist(-LIMS, LIMS) for i in range(NDIM)})
    kwargs = {}
    if ntemps > 1:
        kwargs["tempering_kwargs"] = dict(ntemps=ntemps)
    ens = EnsembleSampler(NWALKERS, NDIM, ll, priors, seed=1234, **kwargs)
    size = (ntemps, NWALKERS) if ntemps > 1 else (NWALKERS,)
    coords = priors.rvs(size=size)
    ens.run_mcmc(coords, NSTEPS, burn=BURN)
    return ens


def test_config_a_parity():
    """Config A (BASELINE configs[0]): 5-D Gaussian, 1 temp, stretch."""
    ref = _run_reference(ntemps=1)
    ours = _run_ours(ntemps=1)

    acc_ref = float(np.mean(ref.acceptance_fraction))
    acc_ours = float(np.mean(ours.acceptance_fraction))
    # same proposal, same target: acceptance fractions agree closely
    assert abs(acc_ref - acc_ours) < 0.05, (acc_ref, acc_ours)

    chain_ref = ref.get_chain()["model_0"].reshape(-1, NDIM)
    chain_ours = ours.get_chain()["model_0"].reshape(-1, NDIM)
    assert np.abs(chain_ref.mean(0) - chain_ours.mean(0)).max() < 0.15
    assert np.abs(chain_ref.std(0) - chain_ours.std(0)).max() < 0.1


def test_config_b_parity():
    """Config B (BASELINE configs[1]): PT with ntemps=10 adaptive ladder."""
    ntemps = 10
    ref = _run_reference(ntemps=ntemps)
    ours = _run_ours(ntemps=ntemps)

    # in-model acceptance per temperature rung tracks the reference
    acc_ref = np.mean(np.asarray(ref.acceptance_fraction), axis=-1)
    acc_ours = np.mean(np.asarray(ours.acceptance_fraction), axis=-1)
    assert np.abs(acc_ref - acc_ours).max() < 0.08, (acc_ref, acc_ours)

    # cold-chain posterior matches
    chain_ref = ref.get_chain()["model_0"][:, 0].reshape(-1, NDIM)
    chain_ours = ours.get_chain()["model_0"][:, 0].reshape(-1, NDIM)
    assert np.abs(chain_ref.mean(0) - chain_ours.mean(0)).max() < 0.15
    assert np.abs(chain_ref.std(0) - chain_ours.std(0)).max() < 0.1

    # adapted ladders agree (log-scale, ignoring the fixed endpoints)
    betas_ref = np.asarray(ref.get_betas()[-1])
    betas_ours = np.asarray(ours.get_betas()[-1])
    log_ratio = np.log(betas_ref[1:-1]) - np.log(betas_ours[1:-1])
    assert np.abs(log_ratio).max() < 0.75, (betas_ref, betas_ours)

    # swap acceptance profiles comparable on the cold rungs
    swap_ref = np.asarray(ref.backend.swaps_accepted) / (
        ref.backend.iteration * NWALKERS
    )
    swap_ours = np.asarray(ours.swap_acceptance_fraction)
    assert np.abs(swap_ref[:4] - swap_ours[:4]).max() < 0.12, (
        swap_ref,
        swap_ours,
    )


def test_make_ladder_parity():
    """Temperature ladders match the reference's exactly."""
    sys.path.insert(0, "/root/reference/src")
    sys.modules.setdefault("corner", types.ModuleType("corner"))
    from eryn.moves.tempering import make_ladder as ref_make_ladder

    from eryn_tpu.moves import make_ladder

    for ndim, ntemps, tmax in [
        (5, 10, None),
        (3, 4, None),
        (150, 8, None),
        (5, 10, np.inf),
        (2, None, 100.0),
    ]:
        ours = make_ladder(ndim, ntemps=ntemps, Tmax=tmax)
        ref = ref_make_ladder(ndim, ntemps=ntemps, Tmax=tmax)
        np.testing.assert_allclose(ours, ref, rtol=1e-10)
