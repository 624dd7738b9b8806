"""Two model families with unknown counts: Gaussian pulses + sinusoids.

Mirrors the reference's multi-branch RJ test
(`/root/reference/tests/test_eryn.py:341-507`): each branch has its own
dimensionality and leaf-count range, `rj_moves=True` proposes births/deaths
in both, and the sampler recovers how many of each signal the data holds.
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


rng = np.random.default_rng(1)
num = 256
t_np = np.linspace(0.0, 10.0, num)
sigma = 0.5

# truth: 2 gaussian pulses + 1 sinusoid
injection = (
    3.0 * np.exp(-((t_np - 2.5) ** 2) / (2 * 0.4**2))
    + 2.6 * np.exp(-((t_np - 7.0) ** 2) / (2 * 0.5**2))
    + 1.2 * np.sin(2 * np.pi * 0.7 * t_np)
)
y = injection + sigma * rng.standard_normal(num)
t_j, y_j = jnp.asarray(t_np), jnp.asarray(y)

NT, NW = 6, 100
NLMAX = {"gauss": 4, "sine": 2}


def log_like(coords, inds):
    a, b, c = (coords["gauss"][:, i] for i in range(3))
    pulses = a[:, None] * jnp.exp(
        -((t_j[None] - b[:, None]) ** 2) / (2 * c[:, None] ** 2)
    )
    amp, f, ph = (coords["sine"][:, i] for i in range(3))
    sines = amp[:, None] * jnp.sin(
        2 * jnp.pi * f[:, None] * t_j[None] + ph[:, None]
    )
    tmpl = jnp.sum(jnp.where(inds["gauss"][:, None], pulses, 0.0), axis=0)
    tmpl += jnp.sum(jnp.where(inds["sine"][:, None], sines, 0.0), axis=0)
    return -0.5 * jnp.sum(((tmpl - y_j) / sigma) ** 2)


priors = {
    "gauss": ProbDistContainer(
        {0: uniform_dist(0.5, 5.0), 1: uniform_dist(0.0, 10.0), 2: uniform_dist(0.1, 1.0)}
    ),
    "sine": ProbDistContainer(
        {0: uniform_dist(0.2, 3.0), 1: uniform_dist(0.1, 2.0), 2: uniform_dist(0.0, 2 * np.pi)}
    ),
}

ens = EnsembleSampler(
    NW,
    {"gauss": 3, "sine": 3},
    log_like,
    priors,
    branch_names=["gauss", "sine"],
    nleaves_max=NLMAX,
    nleaves_min={"gauss": 0, "sine": 0},
    moves=RedBlueGroupStretchMove(),  # RJ-correct in-model stretch
    rj_moves="iterate_branches",
    tempering_kwargs=dict(ntemps=NT),
    fill_zero_leaves_val=float(-0.5 * np.sum((y / sigma) ** 2)),
    periodic={"sine": {2: 2 * np.pi}},
    seed=7,
)

coords = {n: priors[n].rvs(size=(NT, NW, NLMAX[n])) for n in NLMAX}
inds = {n: rng.random((NT, NW, NLMAX[n])) < 0.5 for n in NLMAX}
ens.run_mcmc(State(coords, inds=inds), _steps(1500), burn=_steps(1500), progress=False)

for name in ("gauss", "sine"):
    k = ens.get_nleaves()[name][:, 0]
    dist = {int(v): round(float((k == v).mean()), 3) for v in np.unique(k)}
    print(f"{name}: leaf-count posterior {dist}")
centers = ens.get_chain()["gauss"][:, 0][..., 1][ens.get_inds()["gauss"][:, 0]]
print("pulse centers (quartiles):", np.round(np.percentile(centers, [25, 75]), 2))
freqs = ens.get_chain()["sine"][:, 0][..., 1][ens.get_inds()["sine"][:, 0]]
print("sine frequency (median):", round(float(np.median(freqs)), 3))
