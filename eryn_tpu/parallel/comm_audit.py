"""Communication-pattern audit of the compiled sharded sampler step.

Statistical equivalence tests prove a sharded run computes the right
*answer*, but GSPMD could satisfy them by all-gathering the whole ensemble
every step — correct numbers, destroyed multi-chip performance.  This module
inspects the *compiled* per-device HLO of the sampler's bulk step and
tallies the collective ops (all-gather / all-reduce / collective-permute /
all-to-all / reduce-scatter) with their payload bytes, so tests and the
driver's ``dryrun_multichip`` artifact can assert the traffic itself:

* cross-device traffic per step stays O(one swap-phase payload) — adjacent
  rung rows riding collective-permutes over the temp axis of the mesh
  (the traffic that maps the reference's swap loop,
  ``/root/reference/src/eryn/moves/tempering.py:515-559``);
* no all-gather / all-reduce of the full ``(ntemps, nwalkers, nleaves,
  ndim)`` coords tensor exists anywhere in the module.

The HLO of an SPMD-partitioned module is the per-device program, so result
shapes are per-shard and the byte totals bound the per-device traffic of
one executed step (ops inside a ``while`` body count once per iteration;
the audit lowers a single-step program so the static tally IS the per-step
cost).
"""

from __future__ import annotations

import re

import numpy as np

import jax.numpy as jnp

__all__ = ["collective_stats", "audit_sampler_comm", "COLLECTIVE_OPS"]

COLLECTIVE_OPS = (
    "all-gather",
    "all-reduce",
    "collective-permute",
    "all-to-all",
    "reduce-scatter",
)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "pred": 1, "c64": 8, "c128": 16,
}

# `%name = f32[8,64]{1,0} all-gather(...)` (and the async -start/-done split
# forms); tuple-shaped results are matched per element by the leading `(`.
_COLL_RE = re.compile(
    r"=\s+\(?([a-z0-9]+)\[([0-9,]*)\]\S*\s+"
    r"(" + "|".join(COLLECTIVE_OPS) + r")"
    r"(?:-start|-done)?\("
)


def collective_stats(hlo_text):
    """Parse collective ops out of compiled HLO text.

    Returns a list of ``(op, dtype, shape, nbytes)`` tuples, one per
    collective instruction (async ``-done`` halves report zero bytes so
    start/done pairs are not double counted).
    """
    out = []
    for m in _COLL_RE.finditer(hlo_text):
        dt, dims, op = m.group(1), m.group(2), m.group(3)
        shape = tuple(int(d) for d in dims.split(",") if d) if dims else ()
        nbytes = int(np.prod(shape, dtype=np.int64)) * _DTYPE_BYTES.get(dt, 4)
        if "-done(" in m.group(0):
            nbytes = 0
        out.append((op, dt, shape, nbytes))
    return out


def _lower_bulk(sampler, state, nstored=1, thin_by=1, store=False):
    """Lower + compile the sampler's bulk step fn with the exact argument
    layout ``EnsembleSampler._dispatch_bulk`` uses (kept in one place so the
    audit cannot desync from the dispatch path)."""
    sampler._detect_sharding(state)
    if sampler._kernel_states is None:
        sampler._kernel_states = sampler._init_kernel_states(state)
    fn = sampler._get_bulk_fn(nstored, thin_by, store)
    time = jnp.asarray(0, dtype=jnp.int32)
    counters = (
        jnp.asarray(sampler._move_accepted, dtype=sampler.dtype),
        jnp.asarray(sampler._move_nprop, dtype=sampler.dtype),
        jnp.asarray(sampler._rj_move_accepted, dtype=sampler.dtype),
        jnp.asarray(sampler._rj_move_nprop, dtype=sampler.dtype),
    )
    lowered = fn.lower(
        sampler._key, state, time, *counters, sampler._kernel_states
    )
    return lowered.compile()


def audit_sampler_comm(sampler, state):
    """Compile ONE sharded sampler step and tally its collective traffic.

    Args:
        sampler: an :class:`~eryn_tpu.ensemble.EnsembleSampler`.
        state: a concrete :class:`~eryn_tpu.state.State` already placed on
            a multi-device mesh (``parallel.mesh.shard_state``).

    Returns:
        dict with ``per_op`` ``{op: {"count", "bytes"}}``, ``total_bytes``
        (sum of per-device collective result bytes for one step),
        ``full_coords_bytes`` (the whole unsharded coords tensor —
        the payload an all-gather regression would move),
        ``payload_bytes`` (coords + log_like + log_prior — one swap-phase
        payload upper bound), and ``big_gathers`` (any all-gather /
        all-reduce whose single result is >= the full coords tensor).
    """
    compiled = _lower_bulk(sampler, state)
    stats = collective_stats(compiled.as_text())

    per_op = {}
    for op, _dt, _shape, nb in stats:
        slot = per_op.setdefault(op, {"count": 0, "bytes": 0})
        slot["count"] += 1
        slot["bytes"] += nb

    itemsize = jnp.dtype(sampler.dtype).itemsize
    full_coords = sum(
        int(np.prod(state.branches_coords[n].shape)) * itemsize
        for n in sampler.branch_names
    )
    nt_nw = int(np.prod(state.log_like.shape))
    payload = full_coords + 2 * nt_nw * itemsize

    big = [
        {"op": op, "dtype": dt, "shape": list(shape), "bytes": nb}
        for op, dt, shape, nb in stats
        if op in ("all-gather", "all-reduce") and nb >= full_coords
    ]
    return {
        "per_op": per_op,
        "total_bytes": sum(s[-1] for s in stats),
        "full_coords_bytes": full_coords,
        "payload_bytes": payload,
        "big_gathers": big,
    }
