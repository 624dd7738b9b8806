"""Porting a custom move: the host on-ramp vs the traced kernel.

eryn_tpu runs reference-style custom moves unchanged: subclass ``MHMove``
and implement the host-NumPy ``get_proposal`` (the reference protocol,
ref ``mh.py:16-60``), and the sampler drops into host-step mode — correct,
but orders of magnitude slower than the compiled path.  Porting the same
proposal to ``get_proposal_kernel`` (jax.numpy, keyed RNG) puts the whole
chain back inside one compiled scan.

This example implements the SAME proposal both ways — a per-walker
scaled-covariance jump — and times them.

Run: python examples/custom_moves.py
"""

import os
import sys
import time
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
from eryn_tpu.moves import MHMove

from _common import example_steps as _steps


NDIM, NWALKERS = 4, 64
SCALE = 0.6 / np.sqrt(NDIM)


class HostJumpMove(MHMove):
    """Reference-protocol custom move: host NumPy ``get_proposal``.

    Defining ``get_proposal`` flips the sampler into host-step mode — the
    porting on-ramp, not the destination.
    """

    def get_proposal(self, branches_coords, random, branches_inds=None, **kwargs):
        q = {}
        for name, c in branches_coords.items():
            c = np.asarray(c)
            q[name] = c + SCALE * random.randn(*c.shape)
        factors = np.zeros(next(iter(q.values())).shape[:2])
        return q, factors


class KernelJumpMove(MHMove):
    """The same proposal as a traced kernel: jax.numpy on static shapes,
    randomness from the ``key`` argument — runs inside the compiled scan."""

    def get_proposal_kernel(self, key, branch_coords, branch_inds, kernel_state, param_masks=None):
        q = {}
        for name, c in branch_coords.items():
            key, sub = jax.random.split(key)
            q[name] = c + SCALE * jax.random.normal(sub, c.shape, dtype=c.dtype)
        factors = jnp.zeros(next(iter(q.values())).shape[:2])
        return q, factors, kernel_state


def log_like(x):
    return -0.5 * jnp.sum(x**2)


def run(move, nsteps, label):
    priors = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(NDIM)})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the host-mode slowness warning
        ens = EnsembleSampler(NWALKERS, NDIM, log_like, priors, moves=move, seed=10)
    # start near the target mode so the short demo chain is converged
    coords = 0.5 * np.random.default_rng(0).standard_normal((1, NWALKERS, NDIM))
    # warm pass: pays the one-time jit compile on the kernel path (the
    # host bridge has nothing to compile); timing the second run compares
    # steady-state throughput
    ens.run_mcmc(coords, max(nsteps // 4, 4))
    ens.reset()
    t0 = time.perf_counter()
    ens.run_mcmc(None, nsteps)
    elapsed = time.perf_counter() - t0
    ch = np.asarray(ens.get_chain()["model_0"]).reshape(-1, NDIM)
    print(
        f"{label:>13}: {nsteps / elapsed:9.1f} steps/s | "
        f"mean {ch.mean():+.3f} std {ch.std():.3f} "
        f"acc {float(np.mean(ens.acceptance_fraction)):.2f}"
    )
    return elapsed


def main():
    n = _steps(400)
    t_host = run(HostJumpMove(), n, "host bridge")
    t_kernel = run(KernelJumpMove(), n, "traced kernel")
    print(f"the traced kernel is {t_host / t_kernel:.1f}x faster at {n} "
          "steps (warm): the host bridge pays per-step Python + dispatch, "
          "the kernel path runs the whole segment as one compiled scan")


if __name__ == "__main__":
    main()
