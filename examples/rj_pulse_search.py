"""Reversible-jump MCMC: how many Gaussian pulses are in the data?

Run: python examples/rj_pulse_search.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist
from eryn_tpu.moves import RedBlueGroupStretchMove

from _common import example_steps as _steps



def main():
    rng = np.random.default_rng(0)
    t_np = np.linspace(0.0, 10.0, 200)
    sigma = 0.3
    # truth: two pulses
    data_np = (
        2.5 * np.exp(-((t_np - 2.5) ** 2) / (2 * 0.5**2))
        + 3.0 * np.exp(-((t_np - 7.0) ** 2) / (2 * 0.7**2))
        + sigma * rng.standard_normal(len(t_np))
    )
    t, data = jnp.asarray(t_np), jnp.asarray(data_np)

    def log_like(coords, inds):
        # coords: (nleaves_max, 3) padded; inds: (nleaves_max,) active mask
        a, b, c = coords[:, 0], coords[:, 1], coords[:, 2]
        pulses = a[:, None] * jnp.exp(
            -((t[None] - b[:, None]) ** 2) / (2 * c[:, None] ** 2)
        )
        template = jnp.sum(jnp.where(inds[:, None], pulses, 0.0), axis=0)
        return -0.5 * jnp.sum(((template - data) / sigma) ** 2)

    priors = ProbDistContainer(
        {
            0: uniform_dist(0.5, 5.0),   # amplitude
            1: uniform_dist(0.0, 10.0),  # center
            2: uniform_dist(0.2, 2.0),   # width
        }
    )

    nwalkers, ntemps, nleaves_max = 64, 8, 4
    ensemble = EnsembleSampler(
        nwalkers,
        3,
        log_like,
        priors,
        nleaves_max=nleaves_max,
        nleaves_min=0,
        # the RJ-correct in-model stretch: each active leaf stretches toward
        # an ACTIVE complement leaf (plain StretchMove would target the
        # same leaf slot, which may be dormant — the sampler warns)
        moves=RedBlueGroupStretchMove(),
        rj_moves=True,
        tempering_kwargs=dict(ntemps=ntemps),
        fill_zero_leaves_val=float(-0.5 * np.sum((data_np / sigma) ** 2)),
        seed=4,
    )

    coords = priors.rvs(size=(ntemps, nwalkers, nleaves_max))
    inds = np.random.rand(ntemps, nwalkers, nleaves_max) < 0.5
    state = State({"model_0": coords}, inds={"model_0": inds})
    ensemble.run_mcmc(state, _steps(1000), burn=_steps(1000), progress=True)

    nleaves = ensemble.get_nleaves()["model_0"][:, 0]  # cold chain
    vals, counts = np.unique(nleaves, return_counts=True)
    print("posterior over pulse count:")
    for v, c in zip(vals, counts):
        print(f"  k={int(v)}: {c / counts.sum():.3f}")

    chain = ensemble.get_chain()["model_0"][:, 0]
    mask = ensemble.get_inds()["model_0"][:, 0]
    centers = chain[..., 1][mask]
    print("recovered pulse centers (quartiles):", np.percentile(centers, [25, 75]))


if __name__ == "__main__":
    main()
