"""Cost breakdown of the north-star config: which pieces dominate a step."""
import time
import numpy as np
import jax, jax.numpy as jnp
from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist

pr = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(5)})
def ll(x): return -0.5 * jnp.sum(x**2)

def rate(tag, **kw):
    ens = EnsembleSampler(100, 5, ll, pr, seed=3, **kw)
    coords = (pr.rvs(size=(ens.ntemps, 100)) if ens.ntemps > 1
              else pr.rvs(size=(100,)))
    state = ens._setup_state(coords, True)
    # warm
    state, _ = ens._run_bulk(state, 1, 2000, store=False)
    jax.block_until_ready(state.log_like)
    t0 = time.perf_counter()
    n = 8000
    state, _ = ens._run_bulk(state, 1, n, store=False)
    jax.block_until_ready(state.log_like)
    dt = time.perf_counter() - t0
    print(f"{tag:42s} {n/dt:9.0f} steps/s  ({1e6*dt/n:6.1f} us/step)")
    return n / dt

rate("1 temp, stretch only")
rate("10 temps, no swaps (permute=False, fixed)", tempering_kwargs=dict(ntemps=10, adaptive=False, permute=False))
rate("10 temps, swaps, no adapt", tempering_kwargs=dict(ntemps=10, adaptive=False))
rate("10 temps, swaps + adapt (north star)", tempering_kwargs=dict(ntemps=10))
