"""Communication-barrier schedule optimization (Syed et al. 2021, §5).

``adaptation_scheme="syed"`` damps the ladder toward the inverse of the
estimated cumulative barrier — the schedule at which every boundary
rejects at the same rate.  The reference only ships the Vousden local
drift (ref ``tempering.py:563-585``); this is the global-reshaping
alternative from the non-reversible-PT paper, usable with either swap
scheme.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
from eryn_tpu.moves.tempering import TemperatureControl

NDIM = 3
NWALKERS = 32


def assert_endpoints_fixed(b, betas0):
    """Endpoint pinning is exact in the LADDER's dtype (the kernel runs in
    f32 by default; f64 literals like 1e-3 are not f32-representable)."""
    ref = np.asarray(betas0, dtype=np.asarray(b).dtype)
    assert b[0] == ref[0] and b[-1] == ref[-1], (b, ref)


def barrier(betas, total=2.0):
    """Analytic cumulative barrier Λ(β) = total * (1 - sqrt(β)): zero at
    the cold rung, increasing as beta drops."""
    return total * (1.0 - np.sqrt(np.asarray(betas, dtype=float)))


def true_acceptance(betas):
    """Per-boundary acceptance implied by the analytic barrier:
    r_i = Λ(β_{i+1}) - Λ(β_i)."""
    return 1.0 - np.clip(np.diff(barrier(betas)), 0.0, 1.0)


def test_syed_kernel_equalizes_rejection():
    """Closed loop against the analytic barrier: iterating the kernel from
    a badly spaced geometric ladder converges to equal per-boundary
    rejection, with endpoints fixed and strict monotonicity throughout."""
    betas0 = np.logspace(0, -3, 8)
    tc = TemperatureControl(
        betas=betas0,
        nwalkers=1,
        adaptation_lag=10000,
        adaptation_time=10,
        adaptation_scheme="syed",
    )
    r0 = 1.0 - true_acceptance(betas0)
    assert r0.max() / r0.min() > 5.0  # the initial spacing really is bad

    betas = jnp.asarray(betas0)
    for t in range(400):
        acc = true_acceptance(np.asarray(betas))
        betas = tc.syed_schedule_kernel(float(t), betas, jnp.asarray(acc))
        b = np.asarray(betas)
        assert_endpoints_fixed(b, betas0)
        assert np.all(np.diff(b) < 0.0), b  # strictly descending

    r = 1.0 - true_acceptance(np.asarray(betas))
    assert r.std() / r.mean() < 0.05, r


def test_syed_kernel_deo_mask_preserves_fixed_point():
    """At the equal-rejection schedule, a phase that attempted only one
    parity class must leave the ladder unchanged (the mean-rejection
    filler equals the truth there)."""
    total = 2.0
    n = 8
    # equal-rejection ladder for Λ(β) = total * (1 - sqrt(β))
    lam_targets = np.linspace(0.0, barrier(1e-3, total), n)
    betas = (1.0 - lam_targets / total) ** 2
    tc = TemperatureControl(
        betas=betas, nwalkers=1, adaptation_scheme="syed", swap_scheme="deo"
    )
    acc = true_acceptance(betas)
    proposed = jnp.asarray(np.arange(n - 1) % 2 == 0)  # even parity only
    out = tc.syed_schedule_kernel(
        0.0, jnp.asarray(betas), jnp.asarray(acc), proposed=proposed
    )
    np.testing.assert_allclose(np.asarray(out), betas, rtol=1e-6)


def test_syed_kernel_monotone_under_noise():
    """Random acceptance vectors never break monotonicity or move the
    endpoints."""
    rng = np.random.default_rng(3)
    betas0 = np.logspace(0, -4, 10)
    tc = TemperatureControl(
        betas=betas0, nwalkers=1, adaptation_time=5, adaptation_scheme="syed"
    )
    betas = jnp.asarray(betas0)
    for t in range(200):
        acc = rng.uniform(0.0, 1.0, size=9)
        betas = tc.syed_schedule_kernel(float(t), betas, jnp.asarray(acc))
        b = np.asarray(betas)
        assert_endpoints_fixed(b, betas0)
        assert np.all(np.diff(b) < 0.0), b


def test_invalid_adaptation_scheme():
    with pytest.raises(ValueError, match="adaptation_scheme"):
        TemperatureControl(
            betas=np.array([1.0, 0.5]), adaptation_scheme="vousden2"
        )


def test_communication_barrier_diagnostic():
    tc = TemperatureControl(betas=np.logspace(0, -2, 5), nwalkers=10)
    lam, total = tc.communication_barrier(
        ratios=np.array([0.8, 0.6, 0.4, 0.2])
    )
    np.testing.assert_allclose(lam, [0.0, 0.2, 0.6, 1.2, 2.0])
    assert total == pytest.approx(2.0)
    # default pulls the accumulated per-attempt counters
    tc.swaps_accepted = np.array([5.0, 5.0, 5.0, 5.0])
    tc.swaps_proposed = np.array([10.0, 10.0, 10.0, 10.0])
    lam, total = tc.communication_barrier()
    assert total == pytest.approx(2.0)


def test_host_adapt_temps_syed_deo():
    """The host mutation API dispatches to the Syed kernel, undoing the
    DEO per-attempt rescale and masking the inactive parity class."""
    betas0 = np.logspace(0, -3, 6)
    tc = TemperatureControl(
        betas=betas0,
        nwalkers=10,
        adaptation_time=5,
        adaptation_scheme="syed",
        swap_scheme="deo",
    )
    # parity-0 phase: boundaries 0, 2, 4 attempted; reporting values are
    # 2x the raw acceptance, zeros elsewhere
    tc.swaps_accepted = np.array([16.0, 0.0, 4.0, 0.0, 4.0])
    tc.swaps_proposed = np.full(5, 10.0)
    tc.adapt_temps()
    b = np.asarray(tc.betas)
    assert tc.time == 1
    assert_endpoints_fixed(b, betas0)
    assert np.all(np.diff(b) < 0.0)
    assert not np.allclose(b, betas0)  # it actually moved


def test_syed_end_to_end_recovers_bad_ladder():
    """A deliberately terrible initial ladder (a huge gap one boundary
    wide) starves that boundary of swaps; the Syed schedule reopens it
    while a non-adaptive control run stays starved."""
    priors = ProbDistContainer(
        {i: uniform_dist(-10, 10) for i in range(NDIM)}
    )

    def log_like(x):
        return -0.5 * jnp.sum(x**2)

    bad_betas = np.array([1.0, 0.95, 0.9, 0.85, 0.002, 0.001])
    coords = priors.rvs(size=(len(bad_betas), NWALKERS))

    fracs = {}
    for label, tk in [
        (
            "syed",
            dict(
                betas=bad_betas,
                adaptive=True,
                adaptation_scheme="syed",
                adaptation_time=25,
            ),
        ),
        ("frozen", dict(betas=bad_betas, adaptive=False)),
    ]:
        ens = EnsembleSampler(
            NWALKERS, NDIM, log_like, priors,
            tempering_kwargs=tk, seed=11,
        )
        ens.run_mcmc(coords, 1200, burn=200)
        fracs[label] = np.asarray(
            ens.backend.swaps_accepted, dtype=float
        ) / max(ens.backend.iteration * NWALKERS, 1)
        if label == "syed":
            betas = np.asarray(ens.get_betas()[-1])
            assert_endpoints_fixed(betas, bad_betas)
            assert np.all(np.diff(betas) < 0.0)
            # the barrier total is a finite, sane diagnostic afterwards
            _, total = ens.temperature_control.communication_barrier(
                ratios=fracs["syed"]
            )
            assert 0.0 < total < len(bad_betas) - 1

    # the starved boundary (index 3) recovers under Syed adaptation
    assert fracs["frozen"][3] < 0.02, fracs["frozen"]
    assert fracs["syed"][3] > 0.05, fracs["syed"]
    # and the schedule is more even overall
    assert fracs["syed"].min() > 2.0 * max(fracs["frozen"].min(), 1e-4)


def test_syed_with_deo_end_to_end():
    """The paper's own pairing — DEO swaps + barrier schedule — samples
    the cold chain correctly with a live, monotone, adapted ladder."""
    priors = ProbDistContainer(
        {i: uniform_dist(-7, 7) for i in range(NDIM)}
    )

    def log_like(x):
        return -0.5 * jnp.sum(x**2)

    ntemps = 6
    coords = priors.rvs(size=(ntemps, NWALKERS))
    ens = EnsembleSampler(
        NWALKERS, NDIM, log_like, priors,
        tempering_kwargs=dict(
            ntemps=ntemps, swap_scheme="deo", adaptation_scheme="syed"
        ),
        seed=17,
    )
    ens.run_mcmc(coords, 800, burn=300)
    chain = ens.get_chain()["model_0"][:, 0].reshape(-1, NDIM)
    assert np.abs(chain.mean(axis=0)).max() < 0.15
    assert np.abs(chain.std(axis=0) - 1.0).max() < 0.1
    betas = np.asarray(ens.get_betas()[-1])
    assert np.all(np.diff(betas) < 0.0)
    assert not np.allclose(betas, ens.get_betas()[0])
