"""Non-reversible (DEO) parallel tempering + replica-flow diagnostics.

`swap_scheme="deo"` (Syed et al. 2021) replaces the sequential swap
cascade with deterministic even-odd parity phases of disjoint rung pairs:
an O(1)-depth fully parallel exchange, the throughput-optimal scheme for
wide ladders or cheap likelihoods.  An integer tag riding the state
supplemental is exchanged by the compiled swap phase alongside the chain,
which makes replica trajectories — and their ladder round trips, the unit
of tempering work — directly observable via
``eryn_tpu.utils.utility.replica_round_trips``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist
from eryn_tpu.state import BranchSupplemental
from eryn_tpu.utils.utility import replica_round_trips

from _common import example_steps as _steps

NDIM = 3
NWALKERS = 24
NTEMPS = 8


def log_like(x):
    # two well-separated modes: tempering is what moves walkers between them
    return jnp.logaddexp(
        -0.5 * jnp.sum((x - 3.0) ** 2) / 0.3,
        -0.5 * jnp.sum((x + 3.0) ** 2) / 0.3,
    )


priors = ProbDistContainer({i: uniform_dist(-8, 8) for i in range(NDIM)})
nsteps = _steps(800)

for scheme in ("cascade", "deo"):
    ens = EnsembleSampler(
        NWALKERS, NDIM, log_like, priors,
        tempering_kwargs=dict(ntemps=NTEMPS, swap_scheme=scheme),
        seed=11,
    )
    # replica tags ride the supplemental through the compiled swap phases
    flat = np.arange(NTEMPS * NWALKERS).reshape(NTEMPS, NWALKERS)
    start = State(
        {"model_0": priors.rvs(size=(NTEMPS, NWALKERS))},
        supplemental=BranchSupplemental(
            {"rid": flat.copy()}, base_shape=(NTEMPS, NWALKERS)
        ),
    )
    rungs = np.empty((nsteps, NTEMPS * NWALKERS), dtype=np.int8)
    for i, s in enumerate(ens.sample(start, iterations=nsteps, store=True)):
        tag = np.asarray(s.supplemental["rid"]).ravel()
        pos = np.empty(NTEMPS * NWALKERS, dtype=np.int8)
        pos[tag] = np.repeat(np.arange(NTEMPS, dtype=np.int8), NWALKERS)
        rungs[i] = pos

    trips = replica_round_trips(rungs, NTEMPS)
    swap_frac = np.asarray(ens.backend.swaps_accepted, dtype=float) / (
        nsteps * NWALKERS
    )
    chain = np.asarray(ens.get_chain(discard=nsteps // 4)["model_0"][:, 0])
    frac_upper = (chain[..., 0] > 0).mean()
    print(
        f"{scheme:8s} round trips {trips:5d}  "
        f"swap acc (cold rung, per attempt) {swap_frac[0]:.2f}  "
        f"upper-mode fraction {frac_upper:.2f}"
    )
    if nsteps >= 800:  # statistical assertions only at full scale
        # both modes populated (tempering works) and replicas flow
        assert 0.25 < frac_upper < 0.75, frac_upper
        assert trips > 0
