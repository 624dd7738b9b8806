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
