"""Model carrier handed to moves.

Mirrors the reference ``Model`` namedtuple
(``/root/reference/src/eryn/model.py:8-18``) — the capability bundle every
move's ``propose`` receives — extended with the traced
:class:`~eryn_tpu.moves.move.EvalContext` and PRNG-key plumbing that replace
the reference's global NumPy random state.
"""

from __future__ import annotations

__all__ = ["Model"]


class Model:
    """Read-only capability bundle for proposals.

    Attributes (reference-compatible): ``log_like_fn``,
    ``compute_log_like_fn``, ``compute_log_prior_fn``,
    ``temperature_control``, ``map_fn``, ``random``.
    """

    def __init__(
        self,
        log_like_fn,
        compute_log_like_fn,
        compute_log_prior_fn,
        temperature_control,
        map_fn,
        random,
        eval_context=None,
        sampler=None,
    ):
        self.log_like_fn = log_like_fn
        self.compute_log_like_fn = compute_log_like_fn
        self.compute_log_prior_fn = compute_log_prior_fn
        self.temperature_control = temperature_control
        self.map_fn = map_fn
        self.random = random
        self._eval_context = eval_context
        self._sampler = sampler

    def get_eval_context(self):
        if self._eval_context is None:
            raise RuntimeError(
                "This Model carries no EvalContext: construct it through "
                "sampler.get_model() — a hand-built reference-style "
                "namedtuple carrier cannot drive the traced proposal "
                "kernels."
            )
        return self._eval_context

    def current_key(self):
        if self._sampler is None:
            raise RuntimeError(
                "This Model is not attached to a sampler: PRNG keys are "
                "only available on carriers obtained via "
                "sampler.get_model()."
            )
        return self._sampler.next_key()

    def set_key(self, key):
        if self._sampler is None:
            raise RuntimeError(
                "This Model is not attached to a sampler: PRNG keys are "
                "only available on carriers obtained via "
                "sampler.get_model()."
            )
        self._sampler.set_key(key)

    def __iter__(self):
        # tuple-compatibility with the reference namedtuple
        return iter(
            (
                self.log_like_fn,
                self.compute_log_like_fn,
                self.compute_log_prior_fn,
                self.temperature_control,
                self.map_fn,
                self.random,
            )
        )
