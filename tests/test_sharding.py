"""Multi-chip sharding: the full sampler step compiles and runs with the
State sharded over a (temp, walker) device mesh (8 virtual CPU devices via
conftest's xla_force_host_platform_device_count)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
from eryn_tpu.parallel.mesh import make_mesh, shard_state, sharding_for_state


@pytest.fixture
def sampler():
    ndim = 3
    priors = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(ndim)})
    ens = EnsembleSampler(
        64,
        ndim,
        lambda x: -0.5 * jnp.sum(x**2),
        priors,
        tempering_kwargs=dict(ntemps=4),
        seed=40,
    )
    return ens, priors


def test_mesh_construction():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(8)
    assert mesh.shape == {"temp": 2, "walker": 4}
    mesh1 = make_mesh(8, temp_parallel=1)
    assert mesh1.shape == {"temp": 1, "walker": 8}


def test_sharded_step(sampler):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    ens, priors = sampler
    mesh = make_mesh(8)
    state = ens._setup_state(priors.rvs(size=(4, 64)))
    state = shard_state(state, mesh)

    # ensemble arrays are actually distributed over the mesh
    assert len(state.log_like.sharding.device_set) == 8

    state, _ = ens._run_bulk(state, 1, 3, store=False)
    jax.block_until_ready(state.log_like)
    assert np.all(np.isfinite(np.asarray(state.log_like)))


def test_sharded_full_run(sampler):
    """A sharded initial state flows through run_mcmc with stored chains."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    ens, priors = sampler
    mesh = make_mesh(8, temp_parallel=1)
    state = ens._setup_state(priors.rvs(size=(4, 64)))
    state = shard_state(state, mesh)
    ens.run_mcmc(state, 20, burn=5)
    chain = ens.get_chain()["model_0"]
    assert chain.shape == (20, 4, 64, 1, 3)
    assert np.isfinite(ens.get_log_like()).all()


def _make_pt_sampler(seed):
    ndim = 3
    priors = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(ndim)})
    ens = EnsembleSampler(
        64,
        ndim,
        lambda x: -0.5 * jnp.sum(x**2),
        priors,
        tempering_kwargs=dict(ntemps=4),
        seed=seed,
    )
    return ens, priors


def test_sharded_statistical_equivalence():
    """A sharded run is statistically equivalent to an unsharded run of the
    same config, pinned with z-scored comparisons: every statistic's
    difference is measured in IACT-corrected Monte-Carlo standard errors,
    so a collective that is wrong by more than a few sigma FAILS (the old
    fixed tolerances would have passed a mildly broken sharded path)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    nsteps, burn = 1000, 200
    nwalkers = 64
    results = {}
    for mode in ("unsharded", "sharded"):
        ens, priors = _make_pt_sampler(seed=77)
        state = ens._setup_state(priors.rvs(size=(4, nwalkers)))
        if mode == "sharded":
            mesh = make_mesh(8)
            state = shard_state(state, mesh)
            ens.run_mcmc(state, nsteps, burn=burn)
            # the detected mesh disabled the pallas fast paths and anchored
            # the carry; output stays sharded over all 8 devices
            assert ens._sharding_mesh is mesh
            assert (
                len(ens._previous_state.log_like.sharding.device_set) == 8
            )
        else:
            ens.run_mcmc(state, nsteps, burn=burn)
        chain = np.asarray(ens.get_chain()["model_0"][:, 0]).reshape(-1, 3)
        tau = float(
            np.nanmax(np.asarray(ens.backend.get_autocorr_time()["model_0"]))
        )
        n_eff = chain.shape[0] / max(2.0 * tau, 1.0)
        results[mode] = dict(
            acc=float(ens.acceptance_fraction.mean()),
            swap=np.asarray(ens.swap_acceptance_fraction, dtype=float),
            mean=chain.mean(axis=0),
            std=chain.std(axis=0),
            logl=float(np.asarray(ens.get_log_like()[:, 0]).mean()),
            n_eff=n_eff,
        )
    a, b = results["unsharded"], results["sharded"]

    # posterior moments: z in units of the combined MC standard error
    # (target is N(0, 1): var of the mean = 1/n_eff, of the std = 1/(2 n_eff))
    se_mean = np.sqrt(1.0 / a["n_eff"] + 1.0 / b["n_eff"])
    z_mean = np.abs(a["mean"] - b["mean"]) / se_mean
    se_std = np.sqrt(0.5 / a["n_eff"] + 0.5 / b["n_eff"])
    z_std = np.abs(a["std"] - b["std"]) / se_std
    assert z_mean.max() < 4.0, (z_mean, a["mean"], b["mean"])
    assert z_std.max() < 4.0, (z_std, a["std"], b["std"])

    # mean cold-chain log-likelihood of a 3-D Gaussian: logl ~ -chi2_3/2,
    # var = 3/2; same n_eff correction
    se_logl = np.sqrt(1.5 * (1.0 / a["n_eff"] + 1.0 / b["n_eff"]))
    z_logl = abs(a["logl"] - b["logl"]) / se_logl
    assert z_logl < 4.0, (z_logl, a["logl"], b["logl"])

    # acceptance and per-rung swap fractions: Bernoulli over
    # nsteps * nwalkers trials, inflated x2 for temporal correlation
    n_trials = nsteps * nwalkers
    p = 0.5 * (a["acc"] + b["acc"])
    se_acc = 2.0 * np.sqrt(2.0 * p * (1.0 - p) / n_trials)
    assert abs(a["acc"] - b["acc"]) / se_acc < 4.0
    ps = 0.5 * (a["swap"] + b["swap"])
    se_swap = 2.0 * np.sqrt(
        2.0 * np.clip(ps * (1.0 - ps), 1e-4, None) / n_trials
    )
    z_swap = np.abs(a["swap"] - b["swap"]) / se_swap
    assert z_swap.max() < 4.0, (z_swap, a["swap"], b["swap"])


def test_sharded_new_move_family(sampler):
    """DE / snooker / walk / KDE kernels compile and run on a sharded
    ensemble: their complement gathers and einsums lower to collectives
    over the walker axis."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from eryn_tpu.moves import DEMove, DESnookerMove, KDEMove, WalkMove

    ndim = 3
    priors = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(ndim)})
    ens = EnsembleSampler(
        64,
        ndim,
        lambda x: -0.5 * jnp.sum(x**2),
        priors,
        moves=[
            (DEMove(), 0.25),
            (DESnookerMove(), 0.25),
            (WalkMove(), 0.25),
            (KDEMove(), 0.25),
        ],
        tempering_kwargs=dict(ntemps=4),
        seed=44,
    )
    mesh = make_mesh(8)
    state = ens._setup_state(priors.rvs(size=(4, 64)))
    state = shard_state(state, mesh)
    state, _ = ens._run_bulk(state, 1, 20, store=False)
    jax.block_until_ready(state.log_like)
    assert len(state.log_like.sharding.device_set) == 8
    assert np.isfinite(np.asarray(state.log_like)).all()


def test_sharded_device_backend(sampler):
    """DeviceBackend ingests sharded segment buffers and getters
    materialize them correctly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from eryn_tpu import DeviceBackend

    ndim = 3
    priors = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(ndim)})
    ens = EnsembleSampler(
        64,
        ndim,
        lambda x: -0.5 * jnp.sum(x**2),
        priors,
        backend=DeviceBackend(),
        tempering_kwargs=dict(ntemps=4),
        seed=45,
    )
    mesh = make_mesh(8)
    state = ens._setup_state(priors.rvs(size=(4, 64)))
    state = shard_state(state, mesh)
    ens.run_mcmc(state, 30)
    chain = ens.get_chain(temp_index=0)["model_0"]
    assert chain.shape == (30, 64, 1, ndim)
    assert np.isfinite(chain).all()


def test_sharded_rj_group_run():
    """RJ + group-stretch configuration on a sharded ensemble: compiles,
    runs, stays sharded, and keeps finding the single pulse."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from eryn_tpu import State
    from eryn_tpu.moves import GroupStretchMove

    rng = np.random.default_rng(5)
    t_np = np.linspace(0, 10, 64)
    sigma = 0.4
    data_np = 3.0 * np.exp(-((t_np - 5.0) ** 2) / (2 * 0.7**2))
    data_np = data_np + sigma * rng.standard_normal(len(t_np))
    t, data = jnp.asarray(t_np), jnp.asarray(data_np)

    def ll(coords, inds):
        a, b, c = coords[:, 0], coords[:, 1], coords[:, 2]
        p = a[:, None] * jnp.exp(
            -((t[None] - b[:, None]) ** 2) / (2 * c[:, None] ** 2)
        )
        tmpl = jnp.sum(jnp.where(inds[:, None], p, 0.0), axis=0)
        return -0.5 * jnp.sum(((tmpl - data) / sigma) ** 2)

    pr = ProbDistContainer(
        {
            0: uniform_dist(0.5, 5.0),
            1: uniform_dist(0.0, 10.0),
            2: uniform_dist(0.2, 2.0),
        }
    )
    nlmax = 2
    ens = EnsembleSampler(
        64,
        3,
        ll,
        pr,
        nleaves_max=nlmax,
        nleaves_min=0,
        moves=[GroupStretchMove(n_iter_update=20)],
        rj_moves=True,
        tempering_kwargs=dict(ntemps=4),
        fill_zero_leaves_val=float(-0.5 * np.sum((data_np / sigma) ** 2)),
        seed=41,
    )
    coords = pr.rvs(size=(4, 64, nlmax))
    inds = np.random.default_rng(6).random((4, 64, nlmax)) < 0.5
    mesh = make_mesh(8)
    state = ens._setup_state(State({"model_0": coords}, inds={"model_0": inds}))
    state = shard_state(state, mesh)
    ens.run_mcmc(state, 150, burn=100)
    assert ens._sharding_mesh is mesh
    assert len(ens._previous_state.log_like.sharding.device_set) == 8
    nleaves = ens.get_nleaves()["model_0"][:, 0]
    assert nleaves.mean() > 0.8
    assert np.isfinite(ens.get_log_like()).all()


def test_shard_state_pre_evaluation():
    """shard_state works on a State that has no log_like yet (dims come
    from the coords leaves)."""
    import jax

    from eryn_tpu.parallel.mesh import make_mesh, shard_state
    from eryn_tpu.state import State

    mesh = make_mesh(len(jax.devices()))
    nt = 2 * mesh.shape["temp"]
    nw = 4 * mesh.shape["walker"]
    st = State({"m": jnp.zeros((nt, nw, 1, 3))})
    out = shard_state(st, mesh)
    assert out.branches["m"].coords.shape == (nt, nw, 1, 3)


def test_bare_model_carrier_guards():
    """A hand-built reference-style Model raises descriptive errors when
    used for key plumbing / traced evaluation (must come from
    sampler.get_model())."""
    import pytest as _pytest

    from eryn_tpu.model import Model

    m = Model(None, None, None, None, map, np.random)
    with _pytest.raises(RuntimeError, match="get_model"):
        m.current_key()
    with _pytest.raises(RuntimeError, match="get_model"):
        m.get_eval_context()


def test_sharded_rbgroupstretch_rj():
    """RedBlueGroupStretchMove (complement concat + batched searchsorted)
    compiles and runs over the mesh in an RJ configuration, and the
    flat-likelihood invariant (uniform coords over the prior) holds."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from eryn_tpu import State
    from eryn_tpu.moves import RedBlueGroupStretchMove

    ndim, nlmax, nwalkers, ntemps = 2, 2, 32, 4
    pr = ProbDistContainer({i: uniform_dist(-1.0, 1.0) for i in range(ndim)})

    def ll(coords, inds):
        return jnp.zeros(())

    ens = EnsembleSampler(
        nwalkers, ndim, ll, pr,
        nleaves_max=nlmax, nleaves_min=0,
        moves=RedBlueGroupStretchMove(live_dangerously=True),
        rj_moves=True,
        fill_zero_leaves_val=0.0,
        tempering_kwargs=dict(ntemps=ntemps),
        seed=33,
    )
    mesh = make_mesh(8)
    rng = np.random.default_rng(33)
    coords = pr.rvs(size=(ntemps, nwalkers, nlmax))
    inds = rng.random((ntemps, nwalkers, nlmax)) < 0.5
    state = ens._setup_state(State({"model_0": coords}, inds={"model_0": inds}))
    state = shard_state(state, mesh)
    assert len(state.log_like.sharding.device_set) == 8

    state = ens.run_mcmc(state, 400, burn=100)
    jax.block_until_ready(state.log_like)
    assert len(state.log_like.sharding.device_set) == 8

    chain = ens.get_chain()["model_0"]
    inds_c = ens.get_inds()["model_0"]
    act = chain[inds_c]
    # flat likelihood: active coords uniform over the prior
    assert abs(act.mean()) < 0.05
    assert abs(act.var() - 1.0 / 3.0) < 0.04


def test_sharded_slice_move():
    """SliceMove's lockstep while-loops (stepping-out + shrinkage) compile
    and run SPMD over the mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from eryn_tpu.moves import SliceMove

    ndim, nwalkers, ntemps = 3, 32, 4
    pr = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(ndim)})
    ens = EnsembleSampler(
        nwalkers, ndim,
        lambda x: -0.5 * jnp.sum(x**2),
        pr,
        moves=SliceMove(),
        tempering_kwargs=dict(ntemps=ntemps),
        seed=44,
    )
    mesh = make_mesh(8)
    state = ens._setup_state(pr.rvs(size=(ntemps, nwalkers)))
    state = shard_state(state, mesh)
    state, _ = ens._run_bulk(state, 1, 20, store=False)
    jax.block_until_ready(state.log_like)
    assert len(state.log_like.sharding.device_set) == 8
    assert np.all(np.isfinite(np.asarray(state.log_like)))


def test_sharded_deo_swaps():
    """The DEO parity phase (shifted selects over the temp axis) lowers to
    collectives over a temp-sharded mesh and keeps the chain finite."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    ndim, nwalkers, ntemps = 3, 32, 4
    pr = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(ndim)})
    ens = EnsembleSampler(
        nwalkers, ndim,
        lambda x: -0.5 * jnp.sum(x**2),
        pr,
        tempering_kwargs=dict(ntemps=ntemps, swap_scheme="deo"),
        seed=45,
    )
    mesh = make_mesh(8)  # temp axis split 2-ways: the selects cross shards
    state = ens._setup_state(pr.rvs(size=(ntemps, nwalkers)))
    state = shard_state(state, mesh)
    state, _ = ens._run_bulk(state, 1, 30, store=False)
    jax.block_until_ready(state.log_like)
    assert len(state.log_like.sharding.device_set) == 8
    assert np.all(np.isfinite(np.asarray(state.log_like)))
