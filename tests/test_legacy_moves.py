"""Reference-style custom moves run through the legacy host bridge.

The reference's user extension protocol is host-side subclassing:
``get_proposal`` on ``MHMove``/``RedBlueMove``
(`/root/reference/src/eryn/moves/mh.py:16-60`, ``red_blue.py:16-87``) and
``setup_friends``/``find_friends``/``fix_friends`` on ``GroupMove``
(``group.py:50-96``).  These tests exercise each family, including a
scaled-down port of the reference's own custom GroupStretch test
(`/root/reference/tests/test_eryn.py:813-907`) with RJ and
branch-supplemental friend bookkeeping.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from eryn_tpu import (
    BranchSupplemental,
    EnsembleSampler,
    ProbDistContainer,
    State,
    uniform_dist,
)
from eryn_tpu.moves import GroupStretchMove, MHMove, RedBlueMove

NDIM = 3
NWALKERS = 32


def log_like(x):
    return -0.5 * jnp.sum(x**2)


def _priors():
    return ProbDistContainer({i: uniform_dist(-5, 5) for i in range(NDIM)})


def test_legacy_mh_custom_get_proposal():
    class MyMH(MHMove):
        def get_proposal(
            self, branches_coords, random, branches_inds=None, **kwargs
        ):
            q = {}
            for name, c in branches_coords.items():
                c = np.asarray(c)
                q[name] = c + 0.8 * random.randn(*c.shape)
            factors = np.zeros(next(iter(q.values())).shape[:2])
            return q, factors

    move = MyMH()
    assert move.host_move and move._legacy_family == "mh"
    with pytest.warns(UserWarning, match="host extension protocol"):
        s = EnsembleSampler(
            NWALKERS, NDIM, log_like, _priors(), moves=move, seed=0
        )
    s.run_mcmc(_priors().rvs(size=(1, NWALKERS)), 300, burn=150)
    ch = np.asarray(s.get_chain()["model_0"])[150:]
    assert abs(ch.mean()) < 0.2
    assert abs(ch.std() - 1.0) < 0.2
    acc = s.acceptance_fraction.mean()
    assert 0.05 < acc < 0.95


def test_legacy_redblue_custom_get_proposal():
    from eryn_tpu.moves.legacy import stretch_get_proposal

    calls = {"n": 0}

    class MyStretch(RedBlueMove):
        a = 2.0

        def get_proposal(self, s_all, c_all, random, gibbs_ndim=None, **kw):
            calls["n"] += 1
            return stretch_get_proposal(
                self, s_all, c_all, random, gibbs_ndim=gibbs_ndim
            )

    move = MyStretch()
    assert move.host_move and move._legacy_family == "redblue"
    with pytest.warns(UserWarning, match="host extension protocol"):
        s = EnsembleSampler(
            NWALKERS, NDIM, log_like, _priors(), moves=move, seed=1
        )
    s.run_mcmc(_priors().rvs(size=(1, NWALKERS)), 300, burn=100)
    assert calls["n"] > 0  # the custom hook actually drove the sampler
    ch = np.asarray(s.get_chain()["model_0"])[150:]
    assert abs(ch.mean()) < 0.2
    assert abs(ch.std() - 1.0) < 0.2


def test_builtin_moves_are_not_legacy():
    from eryn_tpu.moves import DistributionGenerate, GaussianMove, StretchMove

    assert not StretchMove().host_move
    assert not GaussianMove({"model_0": 0.1}).host_move
    pr = _priors()
    assert not DistributionGenerate({"model_0": pr}).host_move
    assert not GroupStretchMove().host_move
    s = EnsembleSampler(NWALKERS, NDIM, log_like, pr, seed=3)
    assert not s._has_host_moves


def test_legacy_group_stretch_reference_protocol():
    """Scaled-down port of the reference's own custom-move test
    (`/root/reference/tests/test_eryn.py:813-907`): mean-sorted friends in a
    branch supplemental, RJ birth/death repair via fix_friends."""
    nwalkers, ntemps, ndim = 20, 4, 3
    nleaves_max, nleaves_min = 4, 0
    nfriends = nwalkers

    hook_calls = {"setup": 0, "fix": 0, "find": 0}

    class MeanGaussianGroupMove(GroupStretchMove):
        def setup_friends(self, branches):
            hook_calls["setup"] += 1
            friends = branches["gauss"].coords[0, branches["gauss"].inds[0]]
            means = friends[:, 1].copy()
            self.means, uni = np.unique(means, return_index=True)
            self.friends = friends[uni]
            srt = np.argsort(self.means)
            self.friends[:] = self.friends[srt]
            self.means[:] = self.means[srt]

            current_means = branches["gauss"].coords[
                branches["gauss"].inds, 1
            ]
            dist = np.abs(current_means[:, None] - self.means[None, :])
            take = min(self.nfriends, self.means.shape[0])
            inds_closest = np.argsort(dist, axis=1)[:, : self.nfriends]
            if take < self.nfriends:  # pad by repeating the closest
                inds_closest = np.concatenate(
                    [inds_closest]
                    + [inds_closest[:, :1]] * (self.nfriends - take),
                    axis=1,
                )
            branches["gauss"].branch_supplemental[
                branches["gauss"].inds
            ] = {"inds_closest": inds_closest}
            branches["gauss"].branch_supplemental[
                ~branches["gauss"].inds
            ] = {
                "inds_closest": -np.ones(
                    (ntemps, nwalkers, nleaves_max, self.nfriends), dtype=int
                )[~branches["gauss"].inds]
            }

        def fix_friends(self, branches):
            hook_calls["fix"] += 1
            fix = branches["gauss"].inds & np.all(
                branches["gauss"].branch_supplemental[:]["inds_closest"]
                == -1,
                axis=-1,
            )
            if not np.any(fix):
                return
            current_means = branches["gauss"].coords[fix, 1]
            dist = np.abs(current_means[:, None] - self.means[None, :])
            take = min(self.nfriends, self.means.shape[0])
            inds_closest = np.argsort(dist, axis=1)[:, : self.nfriends]
            if take < self.nfriends:
                inds_closest = np.concatenate(
                    [inds_closest]
                    + [inds_closest[:, :1]] * (self.nfriends - take),
                    axis=1,
                )
            branches["gauss"].branch_supplemental[fix] = {
                "inds_closest": inds_closest
            }

        def find_friends(self, name, s, s_inds=None, branch_supps=None):
            hook_calls["find"] += 1
            friends = np.zeros_like(np.asarray(s))
            inds_closest_here = branch_supps[name][s_inds]["inds_closest"]
            inds_closest_here = np.clip(
                inds_closest_here, 0, self.friends.shape[0] - 1
            )
            random_inds = inds_closest_here[
                np.arange(inds_closest_here.shape[0]),
                np.random.randint(
                    self.nfriends, size=(inds_closest_here.shape[0],)
                ),
            ]
            friends[s_inds] = self.friends[random_inds]
            return friends

    def gaussian_pulse(x, a, b, c):
        return a * np.exp(-((x - b) ** 2) / (2 * c**2))

    num = 128
    t = np.linspace(-1, 1, num)
    gauss_inj_params = [[3.3, -0.2, 0.1], [2.6, 0.1, 0.1]]
    injection = np.zeros(num)
    for p in gauss_inj_params:
        injection += gaussian_pulse(t, *p)
    sigma = 1.0
    y = injection + sigma * np.random.randn(num)

    t_j, y_j = jnp.asarray(t), jnp.asarray(y)

    def ll(coords, inds):
        a, b, c = coords[:, 0], coords[:, 1], coords[:, 2]
        tmpl = jnp.sum(
            jnp.where(
                inds[:, None],
                a[:, None]
                * jnp.exp(-((t_j[None] - b[:, None]) ** 2) / (2 * c[:, None] ** 2)),
                0.0,
            ),
            axis=0,
        )
        return -0.5 * jnp.sum(((tmpl - y_j) / sigma) ** 2)

    coords = {"gauss": np.zeros((ntemps, nwalkers, nleaves_max, ndim))}
    for nn in range(len(gauss_inj_params)):
        coords["gauss"][:, :, nn] = np.random.multivariate_normal(
            gauss_inj_params[nn],
            np.diag(np.ones(3) * 0.0001),
            size=(ntemps, nwalkers),
        )
    inds = {"gauss": np.zeros((ntemps, nwalkers, nleaves_max), dtype=bool)}
    inds["gauss"][:, :, : len(gauss_inj_params)] = True

    priors = {
        "gauss": ProbDistContainer(
            {
                0: uniform_dist(2.0, 4.0),
                1: uniform_dist(t.min(), t.max()),
                2: uniform_dist(0.01, 0.3),
            }
        )
    }
    fill = float(-0.5 * np.sum((y / sigma) ** 2))

    with pytest.warns(UserWarning):
        ensemble = EnsembleSampler(
            nwalkers,
            ndim,
            ll,
            priors,
            tempering_kwargs=dict(ntemps=ntemps),
            branch_names=["gauss"],
            nleaves_max=nleaves_max,
            nleaves_min=nleaves_min,
            moves=MeanGaussianGroupMove(
                nfriends=nfriends, n_iter_update=20
            ),
            rj_moves=True,
            fill_zero_leaves_val=fill,
            seed=4,
        )
    assert ensemble._has_host_moves

    log_prior = ensemble.compute_log_prior(coords, inds=inds)
    log_like_v = ensemble.compute_log_like(coords, inds=inds, logp=log_prior)[0]

    branch_supps = {
        "gauss": BranchSupplemental(
            {
                "inds_closest": np.zeros(
                    inds["gauss"].shape + (nfriends,), dtype=int
                )
            },
            base_shape=(ntemps, nwalkers, nleaves_max),
        )
    }
    state = State(
        coords,
        log_like=log_like_v,
        log_prior=log_prior,
        inds=inds,
        branch_supplemental=branch_supps,
    )
    last = ensemble.run_mcmc(state, 120, burn=10, thin_by=1)

    assert hook_calls["setup"] >= 2  # initial + window refreshes
    assert hook_calls["find"] > 0
    assert hook_calls["fix"] > 0

    nleaves = ensemble.get_nleaves()["gauss"][:, 0]
    # the two injected pulses are strong: the cold chain should keep >= 2
    assert np.median(nleaves) >= 2
    acc = ensemble.acceptance_fraction.mean()
    assert 0.01 < acc < 1.0
    # chain stored and readable
    ch = ensemble.get_chain()["gauss"]
    assert ch.shape[:2] == (120, ntemps)


def test_legacy_mixed_with_builtin_moves():
    """A legacy move and a compiled built-in move share the schedule; both
    drive the chain through the host loop."""
    from eryn_tpu.moves import StretchMove
    from eryn_tpu.moves.legacy import stretch_get_proposal

    class MyStretch(RedBlueMove):
        a = 2.0

        def get_proposal(self, s_all, c_all, random, gibbs_ndim=None, **kw):
            return stretch_get_proposal(
                self, s_all, c_all, random, gibbs_ndim=gibbs_ndim
            )

    with pytest.warns(UserWarning, match="host extension protocol"):
        s = EnsembleSampler(
            NWALKERS,
            NDIM,
            log_like,
            _priors(),
            moves=[(MyStretch(), 0.5), (StretchMove(), 0.5)],
            seed=5,
        )
    s.run_mcmc(_priors().rvs(size=(1, NWALKERS)), 250, burn=100)
    ch = np.asarray(s.get_chain()["model_0"])[100:]
    assert abs(ch.std() - 1.0) < 0.25
    for m in s.moves:
        assert m.num_proposals > 0  # both moves actually ran


def test_legacy_mt_custom_special_like_func():
    """Reference custom-MT protocol: a subclass overriding special_*
    host hooks (ref multipletry.py:113-199) runs through the host bridge,
    with the stock get_proposal/get_mt_proposal driving the hooks; the
    chain recovers the (modified) target."""
    from eryn_tpu.moves import MTDistGenMove
    from eryn_tpu.prior import ProbDistContainer, uniform_dist

    calls = {"like": 0, "prior": 0}

    class MyMT(MTDistGenMove):
        # override the Likelihood hook: sharpen the target (sigma = 0.5)
        def special_like_func(self, generated_coords, **kwargs):
            calls["like"] += 1
            pts = np.asarray(generated_coords)
            return (-0.5 * np.sum((pts / 0.5) ** 2, axis=-1)).reshape(
                -1, self.num_try
            )

        def special_prior_func(self, generated_coords, **kwargs):
            calls["prior"] += 1
            pts = np.asarray(generated_coords)
            inside = np.all(np.abs(pts) < 5.0, axis=-1)
            return np.where(inside, -np.log(10.0) * NDIM, -np.inf).reshape(
                -1, self.num_try
            )

    gen = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(NDIM)})
    move = MyMT(gen, num_try=8, independent=True)
    assert move.host_move and move._legacy_family == "mh"

    with pytest.warns(UserWarning, match="host extension protocol"):
        s = EnsembleSampler(
            NWALKERS, NDIM, log_like, _priors(), moves=move, seed=7
        )
    s.run_mcmc(_priors().rvs(size=(1, NWALKERS)), 250, burn=100)
    assert calls["like"] > 0 and calls["prior"] > 0
    ch = np.asarray(s.get_chain()["model_0"])[100:]
    # the OVERRIDDEN likelihood (sigma=0.5) governs the posterior
    assert abs(ch.mean()) < 0.15
    assert abs(ch.std() - 0.5) < 0.15
    acc = s.acceptance_fraction.mean()
    assert 0.05 < acc <= 1.0


def test_stock_mtdistgen_not_host_move():
    """The stock MTDistGenMove (kernel path) must NOT be classified as a
    legacy host move — only user overrides of the special_* hooks are."""
    from eryn_tpu.moves import MTDistGenMove
    from eryn_tpu.prior import ProbDistContainer, uniform_dist

    gen = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(NDIM)})
    move = MTDistGenMove(gen, num_try=4, independent=True)
    assert not move.host_move


def test_mt_host_get_proposal_matches_kernel_statistics():
    """The stock host get_proposal (reference protocol) and the compiled
    kernel path sample the same posterior."""
    from eryn_tpu.moves import MTDistGenMove
    from eryn_tpu.prior import ProbDistContainer, uniform_dist

    gen = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(NDIM)})

    class ForcedHostMT(MTDistGenMove):
        # no hook overrides: force host mode explicitly to exercise the
        # stock host protocol end-to-end
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.host_move = True
            self._legacy_family = "mh"

    with pytest.warns(UserWarning, match="host extension protocol"):
        s_host = EnsembleSampler(
            NWALKERS, NDIM, log_like, _priors(),
            moves=ForcedHostMT(gen, num_try=6, independent=True), seed=11,
        )
    s_host.run_mcmc(_priors().rvs(size=(1, NWALKERS)), 250, burn=100)
    ch_h = np.asarray(s_host.get_chain()["model_0"])[100:]

    s_kern = EnsembleSampler(
        NWALKERS, NDIM, log_like, _priors(),
        moves=MTDistGenMove(gen, num_try=6, independent=True), seed=11,
    )
    s_kern.run_mcmc(_priors().rvs(size=(1, NWALKERS)), 250, burn=100)
    ch_k = np.asarray(s_kern.get_chain()["model_0"])[100:]

    # same unit-Gaussian target from both protocols
    assert abs(ch_h.mean() - ch_k.mean()) < 0.2
    assert abs(ch_h.std() - ch_k.std()) < 0.2
    assert abs(ch_h.std() - 1.0) < 0.2


def test_legacy_rj_custom_protocol():
    """Reference custom-RJ protocol (ref rj.py:87-143): a subclass
    overriding get_model_change_proposal runs through the host bridge;
    with a flat likelihood the k-posterior is uniform over the allowed
    leaf counts (sharp test of the factors + edge factors)."""
    from eryn_tpu.moves import DistributionGenerateRJ
    from eryn_tpu.prior import ProbDistContainer, uniform_dist

    calls = {"n": 0}

    class MyRJ(DistributionGenerateRJ):
        def get_model_change_proposal(self, inds, random, nmin, nmax):
            calls["n"] += 1
            return super().get_model_change_proposal(inds, random, nmin, nmax)

    pr = ProbDistContainer({0: uniform_dist(-3, 3), 1: uniform_dist(-3, 3)})
    move = MyRJ({"model_0": pr}, nleaves_max={"model_0": 2},
                nleaves_min={"model_0": 0})
    assert move.host_move and move._legacy_family == "rj"

    def flat_ll(coords, inds):
        return jnp.zeros(())

    with pytest.warns(UserWarning, match="host extension protocol"):
        s = EnsembleSampler(
            NWALKERS, {"model_0": 2}, flat_ll, {"model_0": pr},
            nleaves_max={"model_0": 2}, nleaves_min={"model_0": 0},
            rj_moves=move, fill_zero_leaves_val=0.0, seed=17,
        )
    coords = {"model_0": pr.rvs(size=(1, NWALKERS, 2))}
    inds = {"model_0": np.random.default_rng(0).random((1, NWALKERS, 2)) < 0.5}
    from eryn_tpu import State
    s.run_mcmc(State(coords, inds=inds), 400, burn=100)
    assert calls["n"] > 0
    k = np.asarray(s.get_inds()["model_0"]).sum(axis=-1).ravel()
    freqs = np.array([(k == i).mean() for i in range(3)])
    # flat likelihood + prior rebirth => uniform over k in {0, 1, 2}
    assert np.all(np.abs(freqs - 1 / 3) < 0.1), freqs


def test_stock_distgenrj_not_host_move():
    from eryn_tpu.moves import DistributionGenerateRJ
    from eryn_tpu.prior import ProbDistContainer, uniform_dist

    pr = ProbDistContainer({0: uniform_dist(-3, 3)})
    move = DistributionGenerateRJ(
        {"model_0": pr}, nleaves_max={"model_0": 2},
        nleaves_min={"model_0": 0},
    )
    assert not move.host_move


def test_legacy_mt_rj_custom_special_like_func():
    """Reference custom MT-RJ protocol: a subclass overriding the
    special_* hooks runs through the RJ host bridge (death-try inversion,
    one-less-leaf auxiliary base); with a flat likelihood the k-posterior
    is uniform over the allowed leaf counts."""
    from eryn_tpu.moves import MTDistGenMoveRJ
    from eryn_tpu.prior import ProbDistContainer, uniform_dist

    calls = {"like": 0}

    class MyMTRJ(MTDistGenMoveRJ):
        def special_like_func(self, generated_coords, inds_leaves_rj=None, **kw):
            calls["like"] += 1
            # flat likelihood regardless of coords
            return np.zeros(
                (np.asarray(generated_coords).shape[0], self.num_try)
            )

    pr = ProbDistContainer({0: uniform_dist(-3, 3), 1: uniform_dist(-3, 3)})
    move = MyMTRJ({"model_0": pr}, nleaves_max={"model_0": 2},
                  nleaves_min={"model_0": 0}, num_try=4)
    assert move.host_move and move._legacy_family == "rj"

    def flat_ll(coords, inds):
        return jnp.zeros(())

    with pytest.warns(UserWarning, match="host extension protocol"):
        s = EnsembleSampler(
            NWALKERS, {"model_0": 2}, flat_ll, {"model_0": pr},
            nleaves_max={"model_0": 2}, nleaves_min={"model_0": 0},
            rj_moves=move, fill_zero_leaves_val=0.0, seed=29,
        )
    coords = {"model_0": pr.rvs(size=(1, NWALKERS, 2))}
    inds = {"model_0": np.random.default_rng(1).random((1, NWALKERS, 2)) < 0.5}
    from eryn_tpu import State
    s.run_mcmc(State(coords, inds=inds), 400, burn=100)
    assert calls["like"] > 0
    k = np.asarray(s.get_inds()["model_0"]).sum(axis=-1).ravel()
    freqs = np.array([(k == i).mean() for i in range(3)])
    assert np.all(np.abs(freqs - 1 / 3) < 0.1), freqs


def test_legacy_mt_regenerated_aux_unbiased():
    """The regenerated-auxiliary MT branch (independent=False,
    symmetric=False — the default flags) must satisfy detailed balance:
    the chosen auxiliary slot holds the CURRENT point, so the chain
    samples the correct posterior.  (The reference's own version of this
    branch dies on a NameError; before the fix this path double-counted
    the posterior ratio.)"""
    from eryn_tpu.moves import MTDistGenMove
    from eryn_tpu.prior import ProbDistContainer, uniform_dist

    gen = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(NDIM)})

    class ForcedHostMT(MTDistGenMove):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.host_move = True
            self._legacy_family = "mh"

    with pytest.warns(UserWarning, match="host extension protocol"):
        s = EnsembleSampler(
            NWALKERS, NDIM, log_like, _priors(),
            moves=ForcedHostMT(gen, num_try=5), seed=31,  # default flags
        )
    s.run_mcmc(_priors().rvs(size=(1, NWALKERS)), 300, burn=100)
    ch = np.asarray(s.get_chain()["model_0"])[100:]
    assert abs(ch.mean()) < 0.15
    assert abs(ch.std() - 1.0) < 0.15  # double-counting would widen this


def test_custom_propose_override_runs_on_host():
    """A reference-style move overriding propose() itself must be detected
    and actually driven (the compiled scan would silently skip it)."""
    from eryn_tpu.moves import Move

    calls = {"n": 0}

    class MyPropose(Move):
        def propose(self, model, state):
            calls["n"] += 1
            # trivial random-walk MH written against the reference API
            q = {
                n: np.asarray(c) + 0.5 * model.random.randn(*np.asarray(c).shape)
                for n, c in state.branches_coords.items()
            }
            logp = np.asarray(model.compute_log_prior_fn(q, inds=state.branches_inds))
            logl, _ = model.compute_log_like_fn(q, inds=state.branches_inds, logp=logp)
            logl = np.asarray(logl)
            logP = logl + logp
            prev = np.asarray(state.log_like) + np.asarray(state.log_prior)
            acc = (logP - prev) > np.log(model.random.rand(*prev.shape))
            new_state = type(state)(
                q, log_like=logl, log_prior=logp, inds=state.branches_inds
            )
            state = self.update(state, new_state, acc)
            if self.accepted is None:
                self.accepted = np.zeros_like(acc, dtype=float)
            self.accepted += acc
            self.num_proposals += 1
            return state, acc

    move = MyPropose()
    assert move.host_move and move._legacy_family == "custom-propose"
    with pytest.warns(UserWarning, match="host extension protocol"):
        s = EnsembleSampler(
            NWALKERS, NDIM, log_like, _priors(), moves=move, seed=33
        )
    s.run_mcmc(_priors().rvs(size=(1, NWALKERS)), 200, burn=100)
    assert calls["n"] > 0
    ch = np.asarray(s.get_chain()["model_0"])[100:]
    assert abs(ch.mean()) < 0.25
    assert abs(ch.std() - 1.0) < 0.25


def test_move_update_merges_branch_supplementals():
    """Move.update carries accepted walkers' supplemental array entries
    (ref move.py:559-657); skip_supp_names_update entries stay."""
    from eryn_tpu.moves import StretchMove
    from eryn_tpu import BranchSupplemental, State

    ntemps, nw, nl, nd = 1, 4, 1, 2
    rng = np.random.default_rng(3)

    def mk(tag):
        supp = BranchSupplemental(
            {
                "cache": np.full((ntemps, nw, nl, 3), tag, dtype=float),
                "keep": np.full((ntemps, nw, nl), tag, dtype=float),
            },
            base_shape=(ntemps, nw, nl),
        )
        return State(
            {"a": rng.standard_normal((ntemps, nw, nl, nd))},
            log_like=rng.standard_normal((ntemps, nw)),
            log_prior=np.zeros((ntemps, nw)),
            branch_supplemental={"a": supp},
        )

    mv = StretchMove(skip_supp_names_update=["keep"])
    old, new = mk(0.0), mk(1.0)
    acc = np.zeros((ntemps, nw), dtype=bool)
    acc[0, 1] = True
    out = mv.update(old, new, acc)
    supp = out.branches["a"].branch_supplemental
    cache = np.asarray(supp.holder["cache"])
    assert (cache[0, 1] == 1.0).all()  # accepted walker took the new entry
    assert (cache[0, 0] == 0.0).all()  # rejected walker kept the old
    assert (np.asarray(supp.holder["keep"]) == 0.0).all()  # skip list held
