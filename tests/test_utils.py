"""Utilities: TransformContainer, PeriodicContainer, stopping/update hooks,
runtime plotting (analog of `/root/reference/tests/test_eryn.py:660-807`)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
from eryn_tpu.utils import (
    PeriodicContainer,
    SearchConvergeStopping,
    TransformContainer,
)
from eryn_tpu.utils.plot import PlotContainer
from eryn_tpu.utils.updates import (
    AdjustStretchProposalScale,
    CompositeUpdate,
    Update,
    UpdateStep,
)


def test_transform_container():
    tc = TransformContainer(
        input_basis=["a", "c"],
        output_basis=["a", "b", "c"],
        parameter_transforms={"a": np.exp, ("b", "c"): lambda b, c: (b + c, c - b)},
        fill_dict={"b": 2.0},
    )
    params = np.array([[0.0, 1.0], [1.0, 3.0]])
    out = tc.both_transforms(params)
    # fill: [a, 2.0, c]; transforms: a->exp(a); (b,c)->(b+c, c-b)
    expected = np.array(
        [[1.0, 3.0, -1.0], [np.e, 5.0, 1.0]]
    )
    np.testing.assert_allclose(out, expected, rtol=1e-6)

    # traced path works too
    out_j = tc.both_transforms(jnp.asarray(params))
    np.testing.assert_allclose(np.asarray(out_j), expected, rtol=1e-5)


def test_transform_transpose_and_passthrough():
    tc = TransformContainer(input_basis=[0, 1], output_basis=[0, 1])
    params = np.random.randn(5, 2)
    np.testing.assert_allclose(tc.both_transforms(params), params)
    assert tc.transform_base_parameters(params, return_transpose=True).shape == (
        2,
        5,
    )


def test_periodic_container():
    pc = PeriodicContainer({"model_0": {1: 2 * np.pi}}, ndims={"model_0": 3})
    p1 = {"model_0": jnp.asarray([[0.1, 0.2, 0.5]])}
    p2 = {"model_0": jnp.asarray([[0.3, 2 * np.pi - 0.1, 1.0]])}
    d = pc.distance(p1, p2)["model_0"]
    np.testing.assert_allclose(
        np.asarray(d[0]), [0.2, -0.3, 0.5], atol=1e-5
    )
    wrapped = pc.wrap({"model_0": jnp.asarray([[0.0, 7.0, -3.0]])})["model_0"]
    np.testing.assert_allclose(
        np.asarray(wrapped[0]), [0.0, 7.0 - 2 * np.pi, -3.0], atol=1e-5
    )


def test_periodic_in_sampler():
    """Periodic parameter fully wrapped: chain stays in [0, 2pi)."""
    priors = ProbDistContainer(
        {0: uniform_dist(-5, 5), 1: uniform_dist(0, 2 * np.pi)}
    )

    def ll(x):
        return -0.5 * (x[0] ** 2 + jnp.cos(x[1]) ** 2)

    ens = EnsembleSampler(
        32,
        2,
        ll,
        priors,
        periodic={"model_0": {1: 2 * np.pi}},
        seed=21,
    )
    coords = priors.rvs(size=(32,))
    ens.run_mcmc(coords, 200, burn=100)
    chain = ens.get_chain()["model_0"][..., 1]
    assert chain.min() >= 0.0 and chain.max() <= 2 * np.pi


def test_stopping_fn():
    priors = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(2)})
    stop = SearchConvergeStopping(n_iters=3, diff=1e9)  # trips immediately
    ens = EnsembleSampler(
        16,
        2,
        lambda x: -0.5 * jnp.sum(x**2),
        priors,
        stopping_fn=stop,
        stopping_iterations=5,
        seed=22,
    )
    ens.run_mcmc(priors.rvs(size=(16,)), 200)
    # diff=1e9 means every check counts as converged -> stops after 3 checks
    assert ens.backend.iteration <= 20


def test_update_fn_and_adjust_scale():
    priors = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(2)})
    calls = []

    class Recorder(Update):
        def __call__(self, iter, last_sample, sampler):
            calls.append(iter)

    adjust = AdjustStretchProposalScale()
    update = CompositeUpdate([Recorder(), adjust])
    ens = EnsembleSampler(
        16,
        2,
        lambda x: -0.5 * jnp.sum(x**2),
        priors,
        update_fn=update,
        update_iterations=10,
        seed=23,
    )
    a0 = ens.moves[0].a
    ens.run_mcmc(priors.rvs(size=(16,)), 40)
    assert calls == [10, 20, 30, 40]
    assert ens.moves[0].a != a0  # scale was tuned


def test_update_step_schedule():
    step = UpdateStep(nsteps=100, increment=2, increment_every=500)
    assert not step.check_step(0)
    assert step.check_step(100)
    assert not step.check_step(150)
    assert step.check_step(600)  # interval 200 in [500, 1000)
    assert not step.check_step(700)


def test_plot_container(tmp_path):
    priors = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(2)})
    ens = EnsembleSampler(
        16,
        2,
        lambda x: -0.5 * jnp.sum(x**2),
        priors,
        tempering_kwargs=dict(ntemps=3),
        seed=24,
    )
    ens.run_mcmc(priors.rvs(size=(3, 16)), 30)
    pc = PlotContainer(
        fp="test",
        backend=ens.backend,
        plot_dir=str(tmp_path),
        which_plots=("base", "tempering", "advanced"),
    )
    pc.produce_plots()
    produced = os.listdir(tmp_path)
    assert "test_corner_model_0.png" in produced
    assert "test_log_like.png" in produced
    assert "test_betas.png" in produced
    assert "test_swap_acceptance.png" in produced
    # full reference plot-family parity (ref plot.py:409-988)
    assert "test_ridgeline_model_0.png" in produced
    assert "test_logl_betas.png" in produced
    assert "test_acceptance_evolution.png" in produced
    assert "test_acceptance_tempered_evolution.png" in produced
    assert "test_act_evolution_model_0.png" in produced

    # acceptance-evolution history accumulates across calls
    ens.run_mcmc(None, 30)
    pc.produce_plots()
    assert len(pc._steps) == 2
    assert pc._total_acc_history.shape[0] == 2


def test_plot_rj_and_info_keys(tmp_path):
    from eryn_tpu import State

    priors = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(2)})

    def ll(c, m):
        contrib = -0.5 * jnp.sum(c**2, axis=-1)
        return jnp.sum(jnp.where(m, contrib, 0.0))

    ens = EnsembleSampler(
        16,
        2,
        ll,
        priors,
        nleaves_max=2,
        nleaves_min=0,
        rj_moves=True,
        fill_zero_leaves_val=-100.0,
        seed=25,
    )
    coords = priors.rvs(size=(1, 16, 2))
    inds = np.random.rand(1, 16, 2) < 0.5
    ens.run_mcmc(State({"model_0": coords}, inds={"model_0": inds}), 30)
    pc = PlotContainer(
        fp="rj",
        backend=ens.backend,
        plot_dir=str(tmp_path),
        info_keys={"model_0": ["alpha", "beta"]},
        which_plots=("base", "rj"),
    )
    pc.produce_plots()
    produced = os.listdir(tmp_path)
    assert "rj_leaves_model_0.png" in produced
    assert "rj_leaves_evolution_model_0.png" in produced
    assert pc._labels("model_0", 2) == ["alpha", "beta"]
