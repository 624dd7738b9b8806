"""Correctness of the fused pallas swap-cascade kernel (interpret mode on
CPU) against a direct NumPy simulation of the same pairing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eryn_tpu.ops.pt_swap import pt_swap_cascade


def _numpy_cascade(logl, origin, dbetas, shifts, raccept):
    logl = logl.copy()
    origin = origin.copy()
    ntemps, nw = logl.shape
    sel_out = np.zeros((ntemps - 1, nw))
    for i in range(ntemps - 1, 0, -1):
        s = shifts[i - 1]
        partner = (np.arange(nw) + s) % nw
        pacc = dbetas[i - 1] * (logl[i] - logl[i - 1, partner])
        sel = pacc > raccept[i - 1]
        sel_out[i - 1] = sel
        li = logl[i].copy()
        oi = origin[i].copy()
        logl[i, sel] = logl[i - 1, partner[sel]]
        origin[i, sel] = origin[i - 1, partner[sel]]
        logl[i - 1, partner[sel]] = li[sel]
        origin[i - 1, partner[sel]] = oi[sel]
    return logl, origin, sel_out


def test_cascade_kernel_matches_numpy():
    rng = np.random.default_rng(0)
    ntemps, nw = 6, 37
    logl = rng.standard_normal((ntemps, nw)).astype(np.float32) * 10
    origin = np.arange(ntemps * nw, dtype=np.float32).reshape(ntemps, nw)
    betas = np.logspace(0, -2, ntemps).astype(np.float32)
    dbetas = betas[:-1] - betas[1:]
    shifts = rng.integers(0, nw, size=ntemps - 1).astype(np.int32)
    raccept = np.log(rng.uniform(size=(ntemps - 1, nw))).astype(np.float32)

    out_l, out_o, sel = pt_swap_cascade(
        jnp.asarray(logl),
        jnp.asarray(origin),
        jnp.asarray(dbetas),
        jnp.asarray(shifts),
        jnp.asarray(raccept),
        interpret=True,
    )
    exp_l, exp_o, exp_sel = _numpy_cascade(logl, origin, dbetas, shifts, raccept)

    np.testing.assert_allclose(np.asarray(out_l), exp_l, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_o), exp_o)
    np.testing.assert_array_equal(np.asarray(sel), exp_sel)

    # provenance is a permutation: gathering the input logl by it reproduces
    # the swapped logl
    flat = np.asarray(out_o).astype(int).reshape(-1)
    assert sorted(flat) == list(range(ntemps * nw))
    np.testing.assert_allclose(
        logl.reshape(-1)[flat].reshape(ntemps, nw), np.asarray(out_l), rtol=1e-6
    )


def test_pallas_path_statistics():
    """The pallas temper path gives the same swap statistics as the XLA
    path (run via interpret mode on CPU)."""
    from eryn_tpu import EnsembleSampler, ProbDistContainer, uniform_dist
    from eryn_tpu.moves.tempering import TemperatureControl
    from eryn_tpu.state import State

    ntemps, nw = 6, 64
    rng = np.random.default_rng(1)
    tc = TemperatureControl(5, nw, ntemps=ntemps, adaptive=False)

    logl = jnp.asarray(rng.standard_normal((ntemps, nw)) * 5.0)
    state = State(
        {"model_0": jnp.asarray(rng.standard_normal((ntemps, nw, 1, 3)))},
        log_like=logl,
        log_prior=jnp.zeros((ntemps, nw)),
        betas=jnp.asarray(tc.betas),
    )

    n_rep = 200
    accs = {"xla": [], "pallas": []}
    for mode in ("xla", "pallas"):
        for r in range(n_rep):
            key = jax.random.PRNGKey(r)
            if mode == "xla":
                tc.use_pallas = False
                _, swaps, _ = tc.temper_kernel(
                    key, state, jnp.zeros((), jnp.int32), adapt=False
                )
            else:
                tree = {
                    "coords": state.branches_coords,
                    "inds": state.branches_inds,
                    "log_prior": state.log_prior,
                }
                _, _, swaps, _prop = tc._swap_kernel_pallas(
                    key, tree, state.log_like, state.betas, interpret=True
                )
            accs[mode].append(np.asarray(swaps))
    mean_xla = np.mean(accs["xla"], axis=0) / nw
    mean_pallas = np.mean(accs["pallas"], axis=0) / nw
    # same expected per-rung swap acceptance
    np.testing.assert_allclose(mean_pallas, mean_xla, atol=0.05)


def test_rolled_swaps_proposed_counts():
    """The pallas swap path must report the true number of proposed pairings
    per rung (rolled variant skips pairs whose partner lands on a pad lane),
    so ladder adaptation ratios are unbiased."""
    from eryn_tpu.moves.tempering import TemperatureControl
    from eryn_tpu.state import State

    ntemps, nw = 4, 650  # pads to 768: ~15% of naive pairings invalid
    rng = np.random.default_rng(7)
    tc = TemperatureControl(5, nw, ntemps=ntemps, adaptive=False)
    state_tree = {
        "coords": {"m": jnp.asarray(rng.standard_normal((ntemps, nw, 1, 2)))},
        "inds": {"m": jnp.ones((ntemps, nw, 1), bool)},
        "log_prior": jnp.zeros((ntemps, nw)),
    }
    logl = jnp.asarray(
        rng.standard_normal((ntemps, nw)).astype(np.float32) * 5.0
    )
    tc.use_pallas = True
    _, _, acc, prop = jax.jit(
        lambda k: tc._swap_kernel_pallas(
            k, state_tree, logl, jnp.asarray(tc.betas, jnp.float32),
            interpret=True,
        )
    )(jax.random.PRNGKey(3))
    prop = np.asarray(prop)
    acc = np.asarray(acc)
    nwpad = 768
    # every rung proposes at most nw and at least nw - pad pairings
    assert np.all(prop <= nw) and np.all(prop >= nw - (nwpad - nw))
    assert np.all(acc <= prop)


def test_temper_kernel_rescales_partial_proposal_counts():
    """Regression: every consumer outside temper_kernel (backend counters,
    swap_acceptance_fraction, plots, host adapt_temps) divides the returned
    swap counts by nwalkers.  When the cascade proposes fewer pairings per
    rung (the rolled pallas variant skips pad-lane partners), the returned
    counts must be rescaled so those ratios stay unbiased."""
    from eryn_tpu.moves.tempering import TemperatureControl
    from eryn_tpu.state import State

    ntemps, nw = 3, 64
    tc = TemperatureControl(5, nw, ntemps=ntemps, adaptive=False)
    state = State(
        {"m": jnp.zeros((ntemps, nw, 1, 2))},
        log_like=jnp.zeros((ntemps, nw)),
        log_prior=jnp.zeros((ntemps, nw)),
        betas=jnp.asarray(tc.betas),
    )

    # stub cascade: 20 accepts out of only 50 proposed pairings per rung
    def fake_swap_kernel(key, swap_tree, logl, betas, time=None):
        acc = jnp.full((ntemps - 1,), 20.0, dtype=logl.dtype)
        prop = jnp.full((ntemps - 1,), 50.0, dtype=logl.dtype)
        return swap_tree, logl, acc, prop

    tc.swap_kernel = fake_swap_kernel
    _, swaps_accepted, _ = tc.temper_kernel(
        jax.random.PRNGKey(0), state, jnp.zeros((), jnp.int32), adapt=False
    )
    # 20/50 acceptance rate reported on the nwalkers scale
    np.testing.assert_allclose(
        np.asarray(swaps_accepted), 20.0 / 50.0 * nw, rtol=1e-6
    )


def test_make_ladder_validation():
    from eryn_tpu.moves.tempering import make_ladder

    # ntemps=None with infinite Tmax must raise the intended ValueError,
    # not the reference's TypeError(None - 1)
    with pytest.raises(ValueError, match="ntemps and finite Tmax"):
        make_ladder(5, ntemps=None, Tmax=np.inf)
    # the valid inf-Tmax path still appends a beta=0 rung
    betas = make_ladder(5, ntemps=4, Tmax=np.inf)
    assert len(betas) == 4 and betas[-1] == 0.0


def test_provenance_capacity_guard():
    with pytest.raises(ValueError, match="2\\*\\*24"):
        pt_swap_cascade(
            jnp.zeros((2**15, 2**10), jnp.float32),
            jnp.zeros((2**15, 2**10), jnp.float32),
            jnp.zeros((2**15 - 1,), jnp.float32),
            jnp.zeros((2**15 - 1,), jnp.int32),
            jnp.zeros((2**15 - 1, 2**10), jnp.float32),
        )


def _numpy_cascade_rolled(logl, origin, dbetas, shifts, raccept, nwpad):
    nt, nw = logl.shape
    pad = nwpad - nw
    L = np.concatenate([logl, np.zeros((nt, pad), logl.dtype)], axis=1)
    O = np.concatenate([origin, np.zeros((nt, pad), origin.dtype)], axis=1)
    V = np.concatenate(
        [np.ones((nt, nw), bool), np.zeros((nt, pad), bool)], axis=1
    )
    R = np.concatenate(
        [raccept, np.full((nt - 1, pad), np.inf, raccept.dtype)], axis=1
    )
    sel_out = np.zeros((nt - 1, nwpad))
    for i in range(nt - 1, 0, -1):
        s = shifts[i - 1]
        partner = (np.arange(nwpad) + s) % nwpad
        pacc = dbetas[i - 1] * (L[i] - L[i - 1, partner])
        sel = (pacc > R[i - 1]) & V[i] & V[i - 1, partner]
        sel_out[i - 1] = sel
        li, oi = L[i].copy(), O[i].copy()
        L[i, sel] = L[i - 1, partner[sel]]
        O[i, sel] = O[i - 1, partner[sel]]
        L[i - 1, partner[sel]] = li[sel]
        O[i - 1, partner[sel]] = oi[sel]
    return L[:, :nw], O[:, :nw], sel_out[:, :nw]


def test_rolled_cascade_matches_numpy():
    from eryn_tpu.ops.pt_swap import pt_swap_cascade_rolled

    rng = np.random.default_rng(4)
    ntemps, nw = 5, 200  # pads to 256
    logl = rng.standard_normal((ntemps, nw)).astype(np.float32) * 10
    origin = np.arange(ntemps * nw, dtype=np.float32).reshape(ntemps, nw)
    betas = np.logspace(0, -2, ntemps).astype(np.float32)
    dbetas = betas[:-1] - betas[1:]
    shifts = rng.integers(0, nw, size=ntemps - 1).astype(np.int32)
    raccept = np.log(rng.uniform(size=(ntemps - 1, nw))).astype(np.float32)

    out_l, out_o, sel = pt_swap_cascade_rolled(
        jnp.asarray(logl),
        jnp.asarray(origin),
        jnp.asarray(dbetas),
        jnp.asarray(shifts),
        jnp.asarray(raccept),
        interpret=True,
    )
    exp_l, exp_o, exp_sel = _numpy_cascade_rolled(
        logl, origin, dbetas, shifts, raccept, 256
    )
    np.testing.assert_allclose(np.asarray(out_l), exp_l, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_o), exp_o)
    np.testing.assert_array_equal(np.asarray(sel), exp_sel)
    # provenance remains a permutation of the real walkers
    flat = np.asarray(out_o).astype(int).reshape(-1)
    assert sorted(flat) == list(range(ntemps * nw))


def test_payload_cascade_matches_provenance_path():
    """The zero-gather payload cascade (state packed into kernel channels,
    walker relabeling via exact one-hot matmuls) must move every leaf
    EXACTLY as the provenance+gather formulation given the same draws —
    bools, bounded ints, and f32 coords included."""
    from eryn_tpu.moves.tempering import TemperatureControl

    for ntemps, nw in ((6, 64), (4, 700)):  # one-hot and rolled variants
        rng = np.random.default_rng(2)
        tc = TemperatureControl(5, nw, ntemps=ntemps, adaptive=False)
        logl = jnp.asarray(
            rng.standard_normal((ntemps, nw)).astype(np.float32) * 5.0
        )
        betas = jnp.asarray(tc.betas, dtype=jnp.float32)
        tree = {
            "coords": {
                "m": jnp.asarray(
                    rng.standard_normal((ntemps, nw, 2, 3)).astype(np.float32)
                )
            },
            "inds": {"m": jnp.asarray(rng.random((ntemps, nw, 2)) < 0.5)},
            "log_prior": jnp.zeros((ntemps, nw), jnp.float32),
            "supps": {
                "__prov__": jnp.arange(ntemps * nw, dtype=jnp.int32).reshape(
                    ntemps, nw
                )
            },
        }
        key = jax.random.PRNGKey(7)

        assert tc._try_pack_channels(tree, logl) is not None
        out_pay = tc._swap_kernel_pallas(key, tree, logl, betas, interpret=True)

        orig = tc._try_pack_channels
        tc._try_pack_channels = lambda *_a, **_k: None
        try:
            out_prov = tc._swap_kernel_pallas(
                key, tree, logl, betas, interpret=True
            )
        finally:
            tc._try_pack_channels = orig

        tree_p, logl_p, acc_p, prop_p = out_pay
        tree_g, logl_g, acc_g, prop_g = out_prov
        np.testing.assert_array_equal(np.asarray(logl_p), np.asarray(logl_g))
        np.testing.assert_array_equal(np.asarray(acc_p), np.asarray(acc_g))
        np.testing.assert_array_equal(np.asarray(prop_p), np.asarray(prop_g))
        for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(tree_p)[0],
            jax.tree_util.tree_flatten_with_path(tree_g)[0],
        ):
            assert pa == pb
            assert la.dtype == lb.dtype, pa
            np.testing.assert_array_equal(
                np.asarray(la), np.asarray(lb), err_msg=str(pa)
            )


def test_payload_pack_fallback_conditions():
    """Ineligible payloads (f64 logl, unbounded int leaves, oversized
    blocks) decline the payload path instead of packing lossily."""
    from eryn_tpu.moves.tempering import TemperatureControl
    from eryn_tpu.ops import pt_swap

    tc = TemperatureControl(5, 64, ntemps=4, adaptive=False)
    logl32 = jnp.zeros((4, 64), jnp.float32)
    ok_tree = {"x": jnp.zeros((4, 64, 3), jnp.float32)}
    assert tc._try_pack_channels(ok_tree, logl32) is not None
    # f64 ensemble -> decline
    assert tc._try_pack_channels(ok_tree, jnp.zeros((4, 64))) is None or (
        jnp.zeros((4, 64)).dtype == jnp.float32  # x64 disabled: f32 anyway
    )
    # arbitrary int leaf -> decline (could exceed f32 exact range)
    assert (
        tc._try_pack_channels(
            {"idx": jnp.zeros((4, 64), jnp.int32)}, logl32
        )
        is None
    )
    # the sampler's bounded provenance channel is allowed
    assert (
        tc._try_pack_channels(
            {"__prov__": jnp.zeros((4, 64), jnp.int32)}, logl32
        )
        is not None
    )
    # VMEM budget guard
    big = {"x": jnp.zeros((4, 64, pt_swap.PAYLOAD_VMEM_BUDGET // (4 * 64)), jnp.float32)}
    assert tc._try_pack_channels(big, logl32) is None
