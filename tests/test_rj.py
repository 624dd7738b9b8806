"""Reversible-jump MCMC: unknown pulse count (config C analog of
`/root/reference/tests/test_eryn.py:211-339`) and multi-branch RJ."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist

NWALKERS = 40
NTEMPS = 4


def _pulse_data(with_signal=True, n=128, seed=12):
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 10.0, n)
    sigma = 0.3
    data = sigma * rng.standard_normal(n)
    if with_signal:
        data += 3.0 * np.exp(-((t - 5.0) ** 2) / (2 * 0.8**2))
    return jnp.asarray(t), jnp.asarray(data), sigma


def _make_like(t, data, sigma):
    def log_like(coords, inds):
        # coords: (nleaves_max, 3) padded; inds: (nleaves_max,)
        a, b, c = coords[:, 0], coords[:, 1], coords[:, 2]
        pulses = a[:, None] * jnp.exp(
            -((t[None, :] - b[:, None]) ** 2) / (2 * c[:, None] ** 2)
        )
        template = jnp.sum(jnp.where(inds[:, None], pulses, 0.0), axis=0)
        return -0.5 * jnp.sum(((template - data) / sigma) ** 2)

    return log_like


def _run_rj(with_signal, nleaves_max=2, nsteps=400, burn=300):
    t, data, sigma = _pulse_data(with_signal)
    noise_ll = float(-0.5 * np.sum((np.asarray(data) / sigma) ** 2))
    priors = ProbDistContainer(
        {
            0: uniform_dist(0.5, 5.0),
            1: uniform_dist(0.0, 10.0),
            2: uniform_dist(0.2, 2.0),
        }
    )
    ens = EnsembleSampler(
        NWALKERS,
        3,
        _make_like(t, data, sigma),
        priors,
        nleaves_max=nleaves_max,
        nleaves_min=0,
        rj_moves=True,
        tempering_kwargs=dict(ntemps=NTEMPS),
        fill_zero_leaves_val=noise_ll,
        seed=7,
    )
    coords = priors.rvs(size=(NTEMPS, NWALKERS, nleaves_max))
    inds = np.random.rand(NTEMPS, NWALKERS, nleaves_max) < 0.5
    from eryn_tpu import State

    state = State({"model_0": coords}, inds={"model_0": inds})
    ens.run_mcmc(state, nsteps, burn=burn)
    return ens


def test_rj_detects_signal():
    ens = _run_rj(with_signal=True)
    nleaves = ens.get_nleaves()["model_0"][:, 0]  # cold chain
    # strong pulse: cold chain should nearly always keep >= 1 leaf
    assert nleaves.mean() > 0.9
    # leaf-count bounds respected
    assert nleaves.min() >= 0 and nleaves.max() <= 2
    # recovered pulse center near truth on active leaves
    chain = ens.get_chain()["model_0"][:, 0]
    inds = ens.get_inds()["model_0"][:, 0]
    centers = chain[..., 1][inds]
    assert abs(np.median(centers) - 5.0) < 0.5


def test_rj_noise_prefers_fewer_leaves():
    ens_sig = _run_rj(with_signal=True, nsteps=300, burn=200)
    ens_noise = _run_rj(with_signal=False, nsteps=300, burn=200)
    n_sig = ens_sig.get_nleaves()["model_0"][:, 0].mean()
    n_noise = ens_noise.get_nleaves()["model_0"][:, 0].mean()
    assert n_noise < n_sig


def test_rj_multiple_branches():
    rng = np.random.default_rng(3)
    t_np = np.linspace(0.0, 10.0, 128)
    sigma = 0.4
    signal = 3.0 * np.exp(-((t_np - 3.0) ** 2) / (2 * 0.6**2)) + 2.0 * np.sin(
        2 * np.pi * 0.4 * t_np + 1.0
    )
    data_np = signal + sigma * rng.standard_normal(len(t_np))
    t, data = jnp.asarray(t_np), jnp.asarray(data_np)

    def log_like(coords, inds):
        g = coords["gauss"]
        gm = inds["gauss"]
        pulses = g[:, 0][:, None] * jnp.exp(
            -((t[None, :] - g[:, 1][:, None]) ** 2)
            / (2 * g[:, 2][:, None] ** 2)
        )
        template = jnp.sum(jnp.where(gm[:, None], pulses, 0.0), axis=0)
        s = coords["sine"]
        sm = inds["sine"]
        sines = s[:, 0][:, None] * jnp.sin(
            2 * jnp.pi * s[:, 1][:, None] * t[None, :] + s[:, 2][:, None]
        )
        template = template + jnp.sum(jnp.where(sm[:, None], sines, 0.0), axis=0)
        return -0.5 * jnp.sum(((template - data) / sigma) ** 2)

    priors = {
        "gauss": ProbDistContainer(
            {
                0: uniform_dist(0.5, 5.0),
                1: uniform_dist(0.0, 10.0),
                2: uniform_dist(0.2, 2.0),
            }
        ),
        "sine": ProbDistContainer(
            {
                0: uniform_dist(0.5, 5.0),
                1: uniform_dist(0.05, 1.0),
                2: uniform_dist(0.0, 2 * np.pi),
            }
        ),
    }
    nleaves_max = {"gauss": 2, "sine": 2}
    ens = EnsembleSampler(
        NWALKERS,
        {"gauss": 3, "sine": 3},
        log_like,
        priors,
        branch_names=["gauss", "sine"],
        nleaves_max=nleaves_max,
        nleaves_min={"gauss": 0, "sine": 0},
        rj_moves="iterate_branches",
        tempering_kwargs=dict(ntemps=NTEMPS),
        seed=11,
    )
    coords = {
        n: priors[n].rvs(size=(NTEMPS, NWALKERS, nleaves_max[n]))
        for n in nleaves_max
    }
    inds = {
        n: np.random.rand(NTEMPS, NWALKERS, nleaves_max[n]) < 0.5
        for n in nleaves_max
    }
    from eryn_tpu import State

    state = State(coords, inds=inds)
    ens.run_mcmc(state, 300, burn=300)

    nleaves = ens.get_nleaves()
    # both signals present: cold chains should hold at least one leaf each
    assert nleaves["gauss"][:, 0].mean() > 0.7
    assert nleaves["sine"][:, 0].mean() > 0.7
    # rj acceptance tracked
    assert ens.rj_acceptance_fraction is not None
    assert np.isfinite(ens.rj_acceptance_fraction).all()


def test_rj_nleaves_min_positive_edge_factors():
    """k in {1, 2} (nleaves_min > 0): the trans-dimensional posterior must
    match a brute-force quadrature Bayes factor — this pins the edge-factor
    math at BOTH boundaries of a shifted k-range
    (eryn_tpu/moves/rj.py edge factors vs ref rj.py:228-271)."""
    rng = np.random.default_rng(8)
    npts = 64
    t_np = np.linspace(0, 1, npts)
    g = np.exp(-((t_np - 0.5) ** 2) / (2 * 0.1**2))
    sigma = 1.0
    a_true = 1.2
    data_np = a_true * g + sigma * rng.standard_normal(npts)
    amax = 3.0

    def ll_np(amp_sum):
        resid = data_np[None] - amp_sum[:, None] * g[None]
        return -0.5 * np.sum((resid / sigma) ** 2, axis=-1)

    # quadrature: Z_k = E_prior[L] for k active amplitude-only leaves
    a = np.linspace(0.0, amax, 400)
    z1 = np.exp(ll_np(a)).mean()
    A1, A2 = np.meshgrid(a, a, indexing="ij")
    z2 = np.exp(ll_np((A1 + A2).ravel())).mean()
    p2_true = z2 / (z1 + z2)

    t_j, d_j = jnp.asarray(t_np), jnp.asarray(data_np)
    g_j = jnp.asarray(g)

    def our_ll(c, m):
        amp = jnp.sum(jnp.where(m, c[:, 0], 0.0))
        return -0.5 * jnp.sum(((amp * g_j - d_j) / sigma) ** 2)

    priors = ProbDistContainer({0: uniform_dist(0.0, amax)})
    ens = EnsembleSampler(
        64,
        1,
        our_ll,
        priors,
        nleaves_max=2,
        nleaves_min=1,
        rj_moves=True,
        seed=99,
    )
    coords = priors.rvs(size=(1, 64, 2))
    inds0 = np.zeros((1, 64, 2), dtype=bool)
    inds0[..., 0] = True
    inds0[:, ::2, 1] = True
    ens.run_mcmc(
        State({"model_0": coords}, inds={"model_0": inds0}), 4000, burn=1000
    )
    nleaves = ens.get_nleaves()["model_0"][:, 0]
    assert nleaves.min() >= 1 and nleaves.max() <= 2
    p2 = (nleaves == 2).mean()
    assert abs(p2 - p2_true) < 0.05, (p2, p2_true)


def test_rj_dr_moves_raises_with_guidance():
    """dr_moves=True raises like the reference (rj.py:350-353); the naive
    birth-only retry provably biases the k-posterior (verified against the
    quadrature truth before reverting), so the error points at MTDistGenMoveRJ
    as the unbiased retry mechanism."""
    priors = ProbDistContainer({0: uniform_dist(0.0, 3.0)})
    with pytest.raises(NotImplementedError, match="MTDistGenMoveRJ"):
        EnsembleSampler(
            32,
            1,
            lambda c, m: 0.0,
            priors,
            nleaves_max=2,
            nleaves_min=0,
            rj_moves=True,
            dr_moves=True,
            seed=1,
        )


def test_rj_identity_proposals_masked_with_nan_slots():
    """Regression: identity RJ proposals (change == 0, here a fixed-k branch)
    must not count as accepts even when inactive leaf slots hold NaN (the
    reference's chain convention) — NaN != NaN would otherwise defeat the
    coords-unchanged check and inflate rj acceptance toward ~1."""
    from eryn_tpu.moves import DistributionGenerateRJ, StretchMove

    t, data, sigma = _pulse_data(with_signal=True)
    priors = ProbDistContainer(
        {
            0: uniform_dist(0.5, 5.0),
            1: uniform_dist(0.0, 10.0),
            2: uniform_dist(0.2, 2.0),
        }
    )
    # the rj move holds k fixed at 1 while the array is padded to 2 slots
    rj_move = DistributionGenerateRJ(
        {"model_0": priors},
        nleaves_max={"model_0": 1},
        nleaves_min={"model_0": 1},
    )
    ens = EnsembleSampler(
        NWALKERS,
        3,
        _make_like(t, data, sigma),
        priors,
        nleaves_max=2,
        nleaves_min=1,
        moves=[StretchMove()],
        rj_moves=[rj_move],
        seed=23,
    )
    coords = np.asarray(priors.rvs(size=(1, NWALKERS, 2)))
    coords[:, :, 1, :] = np.nan  # inactive slot: NaN-filled
    inds = np.zeros((1, NWALKERS, 2), dtype=bool)
    inds[..., 0] = True
    ens.run_mcmc(State({"model_0": coords}, inds={"model_0": inds}), 50)
    # every rj proposal is an identity: none may be counted as accepted
    assert float(np.max(ens.rj_acceptance_fraction)) == 0.0
    # the in-model move still mixes (NaN slots don't poison the chain)
    assert float(np.mean(ens.acceptance_fraction)) > 0.05
