"""Sequential combination of moves inside one proposal.

TPU-native re-design of ``/root/reference/src/eryn/moves/combine.py:16-135``:
child kernels run back-to-back inside the same traced step (each with its own
tempering epilogue, matching the reference), accepted counts summed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .move import Move

__all__ = ["CombineMove"]


class CombineMove(Move):
    """Run a list of moves sequentially in one ``propose``
    (ref ``combine.py:16``)."""

    def __init__(self, moves, **kwargs):
        self.moves_list = list(moves)
        super().__init__(**kwargs)

    def propagate_wiring(self):
        """Propagate temperature control / periodic into children
        (ref ``combine.py:64-97``)."""
        for m in self.moves_list:
            if m.temperature_control is None:
                m.temperature_control = self.temperature_control
            if m.periodic is None:
                m.periodic = self.periodic
            if hasattr(m, "propagate_wiring"):
                m.propagate_wiring()

    def init_kernel_state(self, state):
        return tuple(m.init_kernel_state(state) for m in self.moves_list)

    def propose_kernel(self, key, state, time, ctx, kernel_state=None):
        self.propagate_wiring()
        if kernel_state is None or kernel_state == ():
            kernel_state = self.init_kernel_state(state)
        ntemps, nwalkers = state.log_like.shape
        accepted = jnp.zeros((ntemps, nwalkers), dtype=state.log_like.dtype)
        swaps = jnp.zeros((max(ntemps - 1, 0),), dtype=state.log_like.dtype)
        new_states = []
        for m, ks in zip(self.moves_list, kernel_state):
            key, sub = jax.random.split(key)
            state, acc, swaps, time, ks = m.propose_kernel(
                sub, state, time, ctx, ks
            )
            accepted = accepted + acc
            new_states.append(ks)
        return state, accepted, swaps, time, tuple(new_states)
