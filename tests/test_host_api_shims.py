"""Reference host-API surface: ``TemperatureControl.temper_comps`` /
``temperature_swaps`` (`/root/reference/src/eryn/moves/tempering.py:484-649`),
``get_mt_computations`` (ref ``multipletry.py:36-59``), and the fail-fast
for callback-unsupported backends."""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import EnsembleSampler, ProbDistContainer, State, uniform_dist
from eryn_tpu.moves import TemperatureControl
from eryn_tpu.moves.multipletry import get_mt_computations

NDIM, NWALKERS, NTEMPS = 3, 64, 5


def _tc():
    return TemperatureControl(
        effective_ndim=NDIM, nwalkers=NWALKERS, ntemps=NTEMPS
    )


def _state():
    coords = {"model_0": np.random.randn(NTEMPS, NWALKERS, 1, NDIM)}
    logl = -0.5 * (coords["model_0"] ** 2).sum(axis=(-1, -2))
    logp = np.zeros_like(logl)
    return State(coords, log_like=logl, log_prior=logp)


def test_temper_comps_swaps_and_adapts():
    tc = _tc()
    state = _state()
    state.betas = np.asarray(tc.betas)
    betas0 = tc.betas.copy()
    out = tc.temper_comps(state)
    # state type + shapes preserved
    assert out.log_like.shape == (NTEMPS, NWALKERS)
    # swaps move log-likelihood values between rungs but preserve the
    # multiset of (value, walker-coord) pairs globally
    all_old = np.sort(np.asarray(state.log_like).ravel())
    all_new = np.sort(np.asarray(out.log_like).ravel())
    np.testing.assert_allclose(all_old, all_new, rtol=1e-6)
    # coords follow their log-likelihoods
    ll_from_coords = -0.5 * (
        np.asarray(out.branches_coords["model_0"]) ** 2
    ).sum(axis=(-1, -2))
    np.testing.assert_allclose(
        ll_from_coords, np.asarray(out.log_like), rtol=1e-5
    )
    # adaptation advanced the clock and moved interior betas
    assert tc.time == 1
    assert not np.allclose(tc.betas[1:-1], betas0[1:-1])
    assert np.asarray(tc.swaps_accepted).shape == (NTEMPS - 1,)
    # adapt=False leaves the clock alone
    t_before = tc.time
    tc.temper_comps(out, adapt=False)
    assert tc.time == t_before


def test_temperature_swaps_reference_signature():
    tc = _tc()
    state = _state()
    x = {n: np.asarray(v) for n, v in state.branches_coords.items()}
    inds = {n: np.asarray(v) for n, v in state.branches_inds.items()}
    logl = np.asarray(state.log_like)
    logp = np.asarray(state.log_prior)
    logP = np.asarray(tc.compute_log_posterior_tempered(logl, logp))
    out = tc.temperature_swaps(x, logP.copy(), logl.copy(), logp.copy(), inds=inds)
    x2, logP2, logl2, logp2, inds2, blobs2, supps2, bs2 = out
    assert blobs2 is None and supps2 is None and bs2 is None
    np.testing.assert_allclose(
        np.sort(logl.ravel()), np.sort(logl2.ravel()), rtol=1e-6
    )
    # returned logP is re-tempered from the swapped parts
    np.testing.assert_allclose(
        logP2,
        np.asarray(tc.compute_log_posterior_tempered(logl2, logp2)),
        rtol=1e-6,
    )
    # coords followed their walkers
    ll_from_coords = -0.5 * (x2["model_0"] ** 2).sum(axis=(-1, -2))
    np.testing.assert_allclose(ll_from_coords, logl2, rtol=1e-5)
    assert np.asarray(tc.swaps_accepted).shape == (NTEMPS - 1,)


def test_get_mt_computations_matches_reference_semantics():
    np.random.seed(3)
    nbatch, ntry = 200, 8
    logP = np.random.randn(nbatch, ntry)
    logq = np.random.randn(nbatch, ntry)
    liw, lsw, keep = get_mt_computations(logP, logq, symmetric=False)
    np.testing.assert_allclose(liw, logP - logq, rtol=1e-12)
    from scipy.special import logsumexp as sp_lse

    np.testing.assert_allclose(lsw, sp_lse(liw, axis=-1), rtol=1e-10)
    assert keep.shape == (nbatch,)
    assert np.all((keep >= 0) & (keep < ntry))
    # symmetric mode ignores the proposal density
    liw_s, _, _ = get_mt_computations(logP, logq, symmetric=True)
    np.testing.assert_allclose(liw_s, logP, rtol=1e-12)
    # selection frequencies track the importance weights (chi^2-ish check
    # on the most-weighted try over many rows)
    best = liw.argmax(axis=-1)
    frac_best = (keep == best).mean()
    expected = np.exp(liw - lsw[:, None])[np.arange(nbatch), best].mean()
    assert abs(frac_best - expected) < 0.12


def test_callback_fail_fast_on_unsupported_backend(monkeypatch):
    import jax as _jax

    import eryn_tpu.ensemble as ens_mod

    def np_like(x):  # host NumPy likelihood -> callback mode
        return -0.5 * float(np.sum(np.asarray(x) ** 2))

    pr = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(NDIM)})
    monkeypatch.setattr(_jax, "default_backend", lambda: "axon")
    with pytest.raises(RuntimeError, match="does not support jax.pure_callback"):
        EnsembleSampler(NWALKERS, NDIM, np_like, pr, seed=0)
    # escape hatch for callback-capable builds
    monkeypatch.setenv("ERYN_TPU_FORCE_CALLBACK", "1")
    with pytest.warns(UserWarning, match="not JAX-traceable"):
        EnsembleSampler(NWALKERS, NDIM, np_like, pr, seed=0)


def test_temperature_control_evidence_methods():
    """Roadmap item (ref docs/source/general/todos.rst): evidence
    estimation on the tempering module, delegating to the utils
    estimators over the control's own ladder."""
    import numpy as np

    from eryn_tpu.moves.tempering import TemperatureControl
    from eryn_tpu.utils.utility import (
        stepping_stone_log_evidence,
        thermodynamic_integration_log_evidence,
    )

    tc = TemperatureControl(5, 32, ntemps=8)
    rng = np.random.default_rng(0)
    logls = rng.standard_normal((200, tc.ntemps, 32)) - 3.0

    mean_logls = logls.mean(axis=(0, 2))
    logz_ti, err_ti = tc.thermodynamic_integration_log_evidence(mean_logls)
    expect_ti = thermodynamic_integration_log_evidence(tc.betas, mean_logls)
    assert np.allclose((logz_ti, err_ti), expect_ti)

    logz_ss, err_ss = tc.stepping_stone_log_evidence(logls, seed=1)
    expect_ss = stepping_stone_log_evidence(tc.betas, logls, seed=1)
    assert np.allclose((logz_ss, err_ss), expect_ss)
    assert np.isfinite(logz_ss) and err_ss >= 0


def test_callback_fail_fast_sees_through_generic_client_name(monkeypatch):
    """The tunneled-TPU plugin's client reports platform "tpu"; only
    platform_version / jax_platforms say "axon".  The guard must identify
    the plugin through those, not just jax.default_backend()."""
    import jax as _jax
    from jax._src import xla_bridge

    from eryn_tpu.ensemble import _active_platform_names

    class FakeClient:
        platform = "tpu"
        platform_version = "axon 0.1.0; SerializedExecutable v9"

    # scope the jax patches: jax internals call get_backend themselves
    with monkeypatch.context() as m:
        m.setattr(_jax, "default_backend", lambda: "tpu")
        m.setattr(xla_bridge, "get_backend", lambda *a, **k: FakeClient())
        assert "axon" in _active_platform_names()

    import eryn_tpu.ensemble as ens_mod

    def np_like(x):
        return -0.5 * float(np.sum(np.asarray(x) ** 2))

    pr = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(NDIM)})
    monkeypatch.setattr(
        ens_mod, "_active_platform_names", lambda: {"tpu", "axon"}
    )
    with pytest.raises(RuntimeError, match="does not support jax.pure_callback"):
        EnsembleSampler(NWALKERS, NDIM, np_like, pr, seed=0)
