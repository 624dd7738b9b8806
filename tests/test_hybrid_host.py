"""Hybrid host-move scheduling: one reference-style custom move must not
cost the whole run the compiled path.

When the schedule mixes host and native moves, the sampler pre-draws the
per-slot move plan on the host; stored steps whose slots are all native run
as compiled bulk scans over the native subset with renormalized weights
(the exact conditional distribution), and only steps containing a host-move
draw execute through the reference's host protocol
(ref ``/root/reference/src/eryn/ensemble.py:963-1045``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
from eryn_tpu.moves import MHMove, StretchMove

NDIM = 3
NWALKERS = 32


def log_like(x):
    return -0.5 * jnp.sum(x**2, axis=-1)


def _priors():
    return ProbDistContainer({i: uniform_dist(-5, 5) for i in range(NDIM)})


class CustomHostMH(MHMove):
    """Reference-style custom move: host get_proposal override."""

    calls = 0

    def get_proposal(
        self, branches_coords, random, branches_inds=None, **kwargs
    ):
        type(self).calls += 1
        q = {}
        for name, c in branches_coords.items():
            c = np.asarray(c)
            q[name] = c + 0.5 * random.randn(*c.shape)
        factors = np.zeros(next(iter(q.values())).shape[:2])
        return q, factors


def _sampler(host_weight=0.1, ntemps=1, seed=0):
    moves = [(StretchMove(), 1.0 - host_weight), (CustomHostMH(), host_weight)]
    kwargs = {}
    if ntemps > 1:
        kwargs["tempering_kwargs"] = dict(ntemps=ntemps)
    with pytest.warns(UserWarning, match="HYBRID"):
        return EnsembleSampler(
            NWALKERS, NDIM, log_like, _priors(), moves=moves, seed=seed,
            **kwargs,
        )


def test_hybrid_engages_and_recovers_posterior():
    CustomHostMH.calls = 0
    s = _sampler(host_weight=0.1)
    assert s._hybrid_host and s._has_host_moves

    coords = _priors().rvs(size=(1, NWALKERS))
    s.run_mcmc(coords, 400, burn=200)

    # the custom move actually ran through the host bridge...
    assert CustomHostMH.calls > 0
    # ...and compiled native-subset segments actually ran
    assert any(key[3] is True for key in s._step_cache), list(s._step_cache)

    ch = np.asarray(s.get_chain()["model_0"])[100:]
    assert abs(ch.mean()) < 0.2
    assert abs(ch.std() - 1.0) < 0.2
    acc = s.acceptance_fraction.mean()
    assert 0.05 < acc < 0.95


def test_hybrid_counter_bookkeeping_exact():
    """Both execution paths land their proposals on the right move objects
    and the totals account for every drawn slot."""
    s = _sampler(host_weight=0.2, seed=3)
    coords = _priors().rvs(size=(1, NWALKERS))
    nsteps = 150
    s.run_mcmc(coords, nsteps)
    s._materialize_counters()
    stretch, custom = s.moves
    total = stretch.num_proposals + custom.num_proposals
    assert total == nsteps * s.num_repeats_in_model, (
        stretch.num_proposals,
        custom.num_proposals,
    )
    # with w=(0.8, 0.2), both must have fired many times in 150 draws
    assert stretch.num_proposals > 60
    assert custom.num_proposals > 5
    # acceptance fractions per move are populated and sane
    fr = s.backend.moves_accepted_fraction
    assert set(fr) == {"StretchMove_0", "CustomHostMH_0"}
    for v in fr.values():
        v = np.asarray(v)
        assert np.all(v >= 0) and np.all(v <= 1)


def test_hybrid_tempered_matches_native_statistics():
    """PT hybrid run matches a pure-native run's posterior and keeps the
    ladder/swap bookkeeping consistent across the host/native boundary."""
    s = _sampler(host_weight=0.08, ntemps=4, seed=5)
    coords = _priors().rvs(size=(4, NWALKERS))
    s.run_mcmc(coords, 500, burn=200)
    ch = np.asarray(s.get_chain()["model_0"])[200:, 0]
    assert abs(ch.mean()) < 0.15
    assert abs(ch.std() - 1.0) < 0.15

    # cold chain log-like beats the hottest rung
    ll = np.asarray(s.get_log_like())[200:]
    assert ll[:, 0].mean() > ll[:, -1].mean()

    # betas moved under adaptation and are stored per step
    betas = np.asarray(s.get_betas())
    assert betas.shape[0] == 500
    assert not np.allclose(betas[0], betas[-1])

    sw = s.swap_acceptance_fraction
    assert sw is not None and np.all(np.asarray(sw) >= 0)


def test_mixed_schedule_native_after_legacy_in_host_step():
    """Within a hybrid host stored step (thin_by > 1), a native move's eager
    kernel can run right after the legacy bridge returned NumPy state leaves
    (betas) — regression for the .at[] on numpy crash."""
    s = _sampler(host_weight=0.5, ntemps=4, seed=9)
    coords = _priors().rvs(size=(4, NWALKERS))
    s.run_mcmc(coords, 40, thin_by=2)
    ch = np.asarray(s.get_chain()["model_0"])
    assert ch.shape[0] == 40
    assert np.all(np.isfinite(np.asarray(s.get_log_like())))


def test_all_host_schedule_stays_host_mode():
    """No native in-model move -> plain host-step mode, not hybrid."""
    with pytest.warns(UserWarning, match="step-by-step on the host"):
        s = EnsembleSampler(
            NWALKERS, NDIM, log_like, _priors(), moves=CustomHostMH(), seed=0
        )
    assert s._has_host_moves and not s._hybrid_host
