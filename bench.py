#!/usr/bin/env python
"""Headline benchmark: PT-ensemble MCMC steps/sec on the north-star config
(BASELINE.json): 5-D Gaussian likelihood, ntemps=10 x nwalkers=100,
StretchMove + adaptive temperature ladder.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

``vs_baseline`` is the speedup over the reference CPU Eryn (mikekatz04/Eryn)
measured live on this machine when importable, else a recorded constant.
"""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference CPU Eryn throughput for this config measured on this container
# (2026-08-16, /root/reference @ v1.2.6, 200-step run): 117.6 steps/s.
FALLBACK_REF_STEPS_PER_SEC = 117.6

NDIM = 5
NWALKERS = 100
NTEMPS = 10
# long device-resident scans measure sustained sampling throughput
# (production runs execute segments this size per dispatch)
NSTEPS = 8000


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist

    invcov = jnp.eye(NDIM)

    def log_like(x):
        return -0.5 * jnp.sum(x * (invcov @ x))

    priors = ProbDistContainer({i: uniform_dist(-5.0, 5.0) for i in range(NDIM)})
    sampler = EnsembleSampler(
        NWALKERS,
        NDIM,
        log_like,
        priors,
        tempering_kwargs=dict(ntemps=NTEMPS),
        seed=0,
    )
    state = sampler._setup_state(priors.rvs(size=(NTEMPS, NWALKERS)))

    # warmup / compile
    state, _ = sampler._run_bulk(state, 1, NSTEPS, store=False)
    jax.block_until_ready(state.log_like)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, _ = sampler._run_bulk(state, 1, NSTEPS, store=False)
        jax.block_until_ready(state.log_like)
        times.append(time.perf_counter() - t0)
    return NSTEPS / min(times)


def bench_reference_cpu():
    """Time the reference CPU Eryn live on the same config (pure NumPy —
    independent of the JAX platform)."""
    try:
        sys.path.insert(0, "/root/reference/src")
        sys.modules.setdefault("corner", types.ModuleType("corner"))
        import numpy as np
        from eryn.ensemble import EnsembleSampler as RefSampler
        from eryn.prior import ProbDistContainer as RefContainer
        from eryn.prior import uniform_dist as ref_uniform

        np.random.seed(42)
        invcov = np.eye(NDIM)

        def ll(x, icov):
            return -0.5 * (x * np.dot(icov, x.T).T).sum()

        priors = RefContainer({i: ref_uniform(-5, 5) for i in range(NDIM)})
        ens = RefSampler(
            NWALKERS,
            NDIM,
            ll,
            priors,
            args=[invcov],
            tempering_kwargs=dict(ntemps=NTEMPS),
        )
        coords = priors.rvs(size=(NTEMPS, NWALKERS))
        ens.run_mcmc(coords, 10, burn=5)  # warmup
        nsteps = 100
        t0 = time.perf_counter()
        ens.run_mcmc(None, nsteps)
        return nsteps / (time.perf_counter() - t0)
    except Exception:
        return FALLBACK_REF_STEPS_PER_SEC


def main():
    value = bench_tpu()
    ref = bench_reference_cpu()
    print(
        json.dumps(
            {
                "metric": "pt_ensemble_steps_per_sec_nt10_nw100_d5",
                "value": round(value, 1),
                "unit": "steps/s",
                "vs_baseline": round(value / ref, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
