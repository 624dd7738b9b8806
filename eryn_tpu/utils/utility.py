"""Diagnostics and ensemble utilities.

Re-design of ``/root/reference/src/eryn/utils/utility.py:8-330``.  Host-side
post-processing diagnostics run in NumPy; ``groups_from_inds`` additionally
has a traced variant (segment ids instead of ``np.unique``) so grouping can
live inside jitted likelihood wrappers.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from scipy.special import logsumexp  # noqa: F401  (module-level re-export, ref utility.py:4)

__all__ = [
    "logsumexp",
    "effective_sample_size",
    "groups_from_inds",
    "groups_from_inds_jax",
    "get_acf",
    "get_integrated_act",
    "get_integrated_act_jax",
    "thermodynamic_integration_log_evidence",
    "stepping_stone_log_evidence",
    "psrf",
    "rank_normalized_rhat",
    "replica_round_trips",
    "rank_normalized_rhat_jax",
    "effective_sample_size_jax",
]


def groups_from_inds(inds: dict) -> dict:
    """Flatten leaf masks into per-leaf flat walker-group ids
    (ref ``utility.py:8-40``).

    Args:
        inds: ``{name: bool (ntemps, nwalkers, nleaves_max)}``.

    Returns:
        ``{name: int (num_active_leaves,)}`` — for each active leaf, the flat
        ``(temp * nwalkers + walker)`` index it belongs to.
    """
    groups = {}
    for name, m in inds.items():
        m = np.asarray(m)
        ntemps, nwalkers, nleaves_max = m.shape
        walker_ids = np.arange(ntemps * nwalkers).reshape(ntemps, nwalkers)
        full = np.broadcast_to(walker_ids[:, :, None], m.shape)
        groups[name] = full[m]
    return groups


def groups_from_inds_jax(inds_flat):
    """Traced analogue over a flattened mask ``(N, nleaves_max)``: returns the
    dense ``(N, nleaves_max)`` group-id array (= walker index broadcast) —
    pair with the mask for segment reductions; no dynamic shapes."""
    N, nleaves_max = inds_flat.shape
    return jnp.broadcast_to(jnp.arange(N)[:, None], (N, nleaves_max))


def get_acf(x, axis=0, fast=False):
    """FFT-based autocorrelation function (ref ``utility.py:43-76``).

    Real-input transform (``rfft``/``irfft``): mathematically identical to
    the reference's complex FFT for real chains, and dramatically faster on
    this container's NumPy build (complex ``fft`` measured ~70x slower than
    ``rfft`` at the relevant sizes)."""
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    m = [slice(None)] * len(x.shape)
    n = x.shape[axis]
    if fast:
        n = int(2 ** np.floor(np.log2(n)))
        m[axis] = slice(0, n)
        x = x[tuple(m)]
    f = np.fft.rfft(x - np.mean(x, axis=axis, keepdims=True), n=2 * n, axis=axis)
    m[axis] = slice(0, n)
    acf = np.fft.irfft(f * np.conjugate(f), n=2 * n, axis=axis)[tuple(m)]
    m[axis] = slice(0, 1)
    return acf / acf[tuple(m)]


def _fill_nonfinite_columns(x):
    """RJ-masked chains carry NaNs for dead leaves; replace each column's
    non-finite entries with the column mean so the FFT ACF stays defined
    (all-NaN columns become zeros -> tau = NaN downstream)."""
    bad = ~np.isfinite(x)
    if not bad.any():
        return x
    import warnings

    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        # all-NaN columns legitimately produce an empty-slice mean here;
        # they become zeros -> tau = NaN downstream, which is the contract
        warnings.simplefilter("ignore", RuntimeWarning)
        col_mean = np.nanmean(np.where(bad, np.nan, x), axis=0, keepdims=True)
    x = np.where(bad, np.broadcast_to(col_mean, x.shape), x)
    return np.nan_to_num(x)


def get_integrated_act(
    x, axis=0, window=50, fast=False, average=True, tol=0, quiet=True
):
    """Integrated autocorrelation time, per parameter
    (ref ``utility.py:79-144``; same fixed-window estimator).

    Args:
        x: the time series.  Either a dict of per-branch chains shaped
           ``(nsteps, ntemps, nwalkers, nleaves_max, ndim)`` or an ndarray
           with the step axis first.
        window: summation window of the ACF (default 50, as the reference).
        average: average the per-walker estimates over axis 1 (the walker
           axis for the dict form / the reference's chain layout).
        tol: if > 0, require ``nsteps > tol * tau``; raises when ``quiet`` is
           False, warns otherwise (emcee ``integrated_time`` semantics).

    Returns:
        dict input -> ``{name: tau}`` with tau shaped
        ``(ntemps, nleaves_max, ndim)`` (``average=True``) or
        ``(ntemps, nwalkers, nleaves_max, ndim)``; ndarray input -> the
        reference's shapes (scalar for 1-D input, step axis summed out, axis
        1 averaged when ``average`` and the result is >= 2-D).
    """
    if axis != 0:
        raise NotImplementedError("get_integrated_act requires axis=0.")

    is_dict = isinstance(x, dict)
    if is_dict:
        shapes = {}
        values_out = []
        breaks = []
        total = 0
        for name, values in x.items():
            values = np.asarray(values, dtype=np.float64)
            nsteps, ntemps, nwalkers, nleaves_max, ndim = values.shape
            shapes[name] = (ntemps, nwalkers, nleaves_max, ndim)
            total += nleaves_max * ndim
            breaks.append(total)
            values_out.append(values.reshape(nsteps, ntemps, nwalkers, -1))
        x_in = np.concatenate(values_out, axis=-1)
    else:
        x_in = np.asarray(x, dtype=np.float64)

    nsteps = x_in.shape[0]
    x_in = _fill_nonfinite_columns(x_in.reshape(nsteps, -1)).reshape(x_in.shape)

    with np.errstate(invalid="ignore", divide="ignore"):
        f = get_acf(x_in, axis=0, fast=fast)

    if f.ndim == 1:
        tau = 1.0 + 2.0 * np.sum(f[1:window])
    else:
        tau = 1.0 + 2.0 * np.sum(f[1:window], axis=0)
        if average and tau.ndim >= 2:
            # nan-aware: an RJ leaf that never activates in SOME walker
            # yields a NaN column tau; the other walkers' estimates must
            # survive the average (all-walker-NaN stays NaN)
            with np.errstate(invalid="ignore"):
                tau = np.nanmean(tau, axis=1)

    if tol > 0:
        tau_max = np.nanmax(np.atleast_1d(tau))
        if np.isfinite(tau_max) and tau_max * tol > nsteps:
            msg = (
                f"The chain is shorter than {tol} times the integrated "
                f"autocorrelation time ({tau_max:.1f})."
            )
            if quiet:
                import warnings

                warnings.warn(msg, stacklevel=2)
            else:
                raise RuntimeError(msg)

    if is_dict:
        splits = np.split(tau, breaks[:-1], axis=-1)
        out = {}
        for (name, shape), split in zip(shapes.items(), splits):
            ntemps, nwalkers, nleaves_max, ndim = shape
            lead = (ntemps,) if average else (ntemps, nwalkers)
            out[name] = split.reshape(lead + (nleaves_max, ndim))
        return out
    return tau


def get_integrated_act_jax(x, window=50, average=True):
    """Device-side integrated autocorrelation time — the same fixed-window
    FFT estimator as :func:`get_integrated_act` (ref ``utility.py:79-144``)
    expressed in ``jax.numpy`` so a device-resident chain
    (:class:`eryn_tpu.backends.DeviceBackend`) never crosses to the host:
    the result is the (tiny) per-parameter tau array.

    Args:
        x: chain with the step axis first, e.g.
           ``(nsteps, ntemps, nwalkers, nleaves_max, ndim)``.  Non-finite
           entries (RJ-masked leaves) are replaced per column by the column
           mean; all-NaN columns give ``tau = NaN``.
        window: ACF summation window (50, as the reference).
        average: average the per-walker estimates over axis 1 when the
           result has >= 2 dims (the reference's walker average).

    Returns:
        Device array of taus with the step axis removed (and axis 1
        averaged when ``average``).
    """
    import jax.numpy as jnp

    x = jnp.asarray(x)
    nsteps = x.shape[0]
    flat = x.reshape(nsteps, -1)
    finite = jnp.isfinite(flat)
    count = finite.sum(axis=0)
    col_mean = jnp.where(
        count > 0,
        jnp.where(finite, flat, 0.0).sum(axis=0) / jnp.maximum(count, 1),
        jnp.nan,
    )
    filled = jnp.where(finite, flat, col_mean[None, :])
    all_nan = count == 0
    filled = jnp.where(all_nan[None, :], 0.0, filled)

    f = jnp.fft.rfft(filled - filled.mean(axis=0, keepdims=True), n=2 * nsteps, axis=0)
    acf = jnp.fft.irfft(f * jnp.conj(f), n=2 * nsteps, axis=0)[:nsteps]
    acf = acf / acf[0:1]
    tau = 1.0 + 2.0 * jnp.sum(acf[1:window], axis=0)
    tau = jnp.where(all_nan, jnp.nan, tau)
    tau = tau.reshape(x.shape[1:])
    if average and tau.ndim >= 2:
        tau = jnp.nanmean(tau, axis=1)
    return tau


def thermodynamic_integration_log_evidence(betas, logls):
    """Thermodynamic-integration log-evidence with half-ladder error estimate
    (ref ``utility.py:147-212``)."""
    betas = np.asarray(betas, dtype=np.float64)
    logls = np.asarray(logls, dtype=np.float64)
    if len(betas) != len(logls):
        raise ValueError("betas and logls must have the same length.")

    order = np.argsort(betas)[::-1]
    betas = betas[order]
    logls = logls[order]

    betas0 = np.copy(betas)
    if betas[-1] != 0.0:
        betas = np.concatenate((betas0, [0.0]))
        betas2 = np.concatenate((betas0[::2], [0.0]))
        logls2 = np.concatenate((logls[::2], [logls[-1]]))
        logls = np.concatenate((logls, [logls[-1]]))
    else:
        betas2 = np.concatenate((betas0[:-1:2], [0.0]))
        logls2 = np.concatenate((logls[:-1:2], [logls[-1]]))

    logZ = -np.trapezoid(logls, betas)
    logZ2 = -np.trapezoid(logls2, betas2)
    return logZ, np.abs(logZ - logZ2)


def stepping_stone_log_evidence(betas, logls, block_len=50, repeats=100, seed=None):
    """Stepping-stone log-evidence with block-bootstrap error
    (ref ``utility.py:215-276``).

    Args:
        betas: ``(ntemps,)`` inverse temperatures.
        logls: ``(nsteps, ntemps, nwalkers)`` log-likelihood samples.
    """
    betas = np.asarray(betas, dtype=np.float64)
    logls = np.asarray(logls, dtype=np.float64)

    order = np.argsort(betas)
    betas_sorted = betas[order]
    logls_sorted = logls[:, order, :]

    def _ss_estimate(ll):
        # ll: (nsamples, ntemps)
        dbetas = np.diff(betas_sorted)
        out = 0.0
        nsamples = ll.shape[0]
        for i, db in enumerate(dbetas):
            x = db * ll[:, i]
            m = np.max(x)
            out += m + np.log(np.mean(np.exp(x - m)))
        return out

    ll_flat = logls_sorted.reshape(logls_sorted.shape[0], logls_sorted.shape[1], -1)
    ll_all = np.moveaxis(ll_flat, 1, 2).reshape(-1, len(betas_sorted))
    logZ = _ss_estimate(ll_all)

    # block bootstrap over time blocks
    rng = np.random.default_rng(seed)
    nsteps = logls_sorted.shape[0]
    block_len = min(block_len, max(nsteps // 2, 1))
    nblocks = max(nsteps // block_len, 1)
    estimates = np.zeros(repeats)
    for r in range(repeats):
        starts = rng.integers(0, nsteps - block_len + 1, size=nblocks)
        sel = np.concatenate([np.arange(s, s + block_len) for s in starts])
        ll_b = logls_sorted[sel]
        ll_b = np.moveaxis(
            ll_b.reshape(ll_b.shape[0], ll_b.shape[1], -1), 1, 2
        ).reshape(-1, len(betas_sorted))
        estimates[r] = _ss_estimate(ll_b)
    return logZ, np.std(estimates)


def psrf(chains, ndim=None, per_walker=True):
    """Gelman-Rubin potential scale reduction factor R-hat
    (ref ``utility.py:279-330``).

    Args:
        chains: ``(nsteps, nwalkers, ndim)`` samples (NaNs allowed for
            RJ-masked entries; they are ignored).
        ndim: optional parameter-count check (raises on mismatch).
        per_walker: ``True`` (default) treats every walker as its own chain
            — the stronger ensemble diagnostic: it catches stuck walkers
            the reference's default misses.  ``False`` reproduces the
            reference's default: pool all walkers and compare the first and
            last thirds of the pooled trace (detects non-stationarity in
            time only).  DELIBERATE DEVIATION: the reference defaults to
            the pooled split; ours defaults to per-walker.

    Returns:
        ``(ndim,)`` R-hat per parameter.
    """
    chains = np.asarray(chains, dtype=np.float64)
    nsteps, nwalkers, nd = chains.shape
    if ndim is not None and int(ndim) != nd:
        raise ValueError(
            f"ndim={ndim} does not match the chains' parameter count {nd}."
        )
    if not per_walker:
        # reference default (utility.py:310-318): pool every walker, then
        # diagnose the first vs last third of the pooled trace
        flat = chains.reshape(-1, nd)
        n = flat.shape[0] // 3
        chains = np.stack([flat[:n], flat[-n:]], axis=1)  # (n, 2, nd)
        nsteps = n
    with np.errstate(invalid="ignore"):
        means = np.nanmean(chains, axis=0)  # (nchains, ndim)
        variances = np.nanvar(chains, axis=0, ddof=1)
        W = np.nanmean(variances, axis=0)
        B = nsteps * np.nanvar(means, axis=0, ddof=1)
        var_est = (1.0 - 1.0 / nsteps) * W + B / nsteps
        Rhat = np.sqrt(var_est / W)
    return Rhat


def _split_chains(chains):
    """Split each chain in half along the step axis -> twice the chains.

    ``chains``: (nsteps, nchains, ndim).  Odd leading steps are dropped
    (Vehtari et al. 2021 §3: splitting detects within-chain trends)."""
    nsteps = chains.shape[0]
    half = nsteps // 2
    if half < 2:
        raise ValueError(
            f"rank-normalized R-hat needs >= 4 steps, got {nsteps}."
        )
    trimmed = chains[nsteps - 2 * half :]
    return np.concatenate([trimmed[:half], trimmed[half:]], axis=1)


def _rank_normalize(x):
    """Fractional-rank z-scores over the POOLED draws of one parameter.

    ``x``: (nsteps, nchains).  NaNs (RJ-masked entries) keep NaN.  Ranks use
    scipy's average method; the blom offset (r - 3/8)/(S + 1/4) then the
    normal quantile, per Vehtari et al. 2021 eq. (14)."""
    from scipy.special import ndtri
    from scipy.stats import rankdata

    flat = x.reshape(-1)
    finite = np.isfinite(flat)
    out = np.full(flat.shape, np.nan)
    s = int(finite.sum())
    if s:
        r = rankdata(flat[finite], method="average")
        out[finite] = ndtri((r - 0.375) / (s + 0.25))
    return out.reshape(x.shape)


def _basic_rhat(z):
    """Split-R-hat of already-transformed draws ``z`` (nsteps, nchains)."""
    n = z.shape[0]
    with np.errstate(invalid="ignore"):
        means = np.nanmean(z, axis=0)
        variances = np.nanvar(z, axis=0, ddof=1)
        W = np.nanmean(variances)
        B = n * np.nanvar(means, ddof=1)
        return float(np.sqrt(((n - 1.0) / n * W + B / n) / W))


def rank_normalized_rhat(chains, ndim=None, return_parts=False):
    """Rank-normalized split-R-hat (Vehtari, Gelman, Simpson, Carpenter &
    Bürkner 2021, "Rank-normalization, folding, and localization") — the
    modern replacement for the classic Gelman-Rubin diagnostic the
    reference ships (``psrf``; ref ``utility.py:279-330``).  Beyond the
    reference: the classic statistic compares chain MEANS, so chains that
    agree in location but disagree in scale — or heavy-tailed targets with
    undefined moments — pass it silently.  This computes

    - **bulk R-hat**: split-R-hat of the rank-normalized draws, and
    - **tail R-hat**: the same after folding about the pooled median
      (sensitive to scale/tail disagreement),

    and reports the elementwise maximum.  Convergence rule of thumb:
    max R-hat < 1.01.

    Args:
        chains: ``(nsteps, nwalkers, ndim)`` samples; every walker is a
            chain.  NaNs (RJ-masked entries) are ignored.
        ndim: optional parameter-count check.
        return_parts: also return the ``(bulk, tail)`` arrays.

    Returns:
        ``(ndim,)`` max(bulk, tail) R-hat per parameter; with
        ``return_parts=True``, ``(rhat, bulk, tail)``.
    """
    chains = np.asarray(chains, dtype=np.float64)
    if chains.ndim == 2:
        chains = chains[..., None]
    nsteps, nwalkers, nd = chains.shape
    if ndim is not None and int(ndim) != nd:
        raise ValueError(
            f"ndim={ndim} does not match the chains' parameter count {nd}."
        )
    split = _split_chains(chains)  # (half, 2*nwalkers, ndim)
    bulk = np.empty(nd)
    tail = np.empty(nd)
    for d in range(nd):
        x = split[..., d]
        bulk[d] = _basic_rhat(_rank_normalize(x))
        folded = np.abs(x - np.nanmedian(x))
        tail[d] = _basic_rhat(_rank_normalize(folded))
    rhat = np.maximum(bulk, tail)
    if return_parts:
        return rhat, bulk, tail
    return rhat


def _ess_of(z):
    """Multi-chain effective sample size of already-transformed draws
    ``z`` (nsteps, nchains), per Vehtari et al. 2021 §3.2 (the Stan
    estimator): between/within-variance-corrected combined
    autocorrelations, Geyer initial-positive pair sums with the monotone
    adjustment.  Non-finite entries (RJ-masked) are filled with the chain
    mean (zero autocovariance contribution, the IACT estimator's
    convention); all-NaN chains are dropped."""
    z = np.asarray(z, dtype=np.float64)
    n, m = z.shape
    finite = np.isfinite(z)
    keep = finite.any(axis=0)
    z, finite = z[:, keep], finite[:, keep]
    m = z.shape[1]
    if n < 4 or m < 2:
        return np.nan
    counts = finite.sum(axis=0)
    means = np.where(finite, z, 0.0).sum(axis=0) / counts
    z = np.where(finite, z, means[None, :])

    variances = z.var(axis=0, ddof=1)
    W = variances.mean()
    B_over_n = means.var(ddof=1) if m > 1 else 0.0
    var_plus = W * (n - 1.0) / n + B_over_n
    if not np.isfinite(var_plus) or var_plus <= 0.0 or W <= 0.0:
        return np.nan

    # per-chain biased autocovariance via FFT, averaged over chains
    f = np.fft.rfft(z - z.mean(axis=0, keepdims=True), n=2 * n, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=2 * n, axis=0)[:n] / n
    rho = 1.0 - (W - acov.mean(axis=1)) / var_plus

    # Geyer initial positive sequence on pair sums, then monotone
    L = (n - 1) // 2
    pairs = rho[0 : 2 * L : 2] + rho[1 : 2 * L : 2]
    nonpos = np.nonzero(pairs <= 0.0)[0]
    trunc = nonpos[0] if nonpos.size else L
    if trunc == 0:
        tau = 1.0
    else:
        tau = -1.0 + 2.0 * np.minimum.accumulate(pairs[:trunc]).sum()
    tau = max(tau, 1.0 / np.log10(max(n * m, 10)))
    return n * m / tau


def effective_sample_size(chains, ndim=None, return_parts=False):
    """Bulk and tail effective sample size (Vehtari, Gelman, Simpson,
    Carpenter & Bürkner 2021) — the companion to
    :func:`rank_normalized_rhat`, beyond the reference (its only mixing
    diagnostic is the per-parameter IACT, ref ``utility.py:79-144``,
    which ignores between-chain disagreement and tail behavior).

    - **bulk ESS**: multi-chain ESS of the rank-normalized split draws —
      sampling efficiency for location summaries (means/medians);
    - **tail ESS**: the minimum ESS of the 5% / 95% quantile indicator
      draws — efficiency for interval estimates, which heavy tails
      degrade first.

    Rule of thumb: both should exceed ~100 per parameter.

    Args:
        chains: ``(nsteps, nwalkers, ndim)`` samples; every walker is a
            chain.  NaNs (RJ-masked entries) are ignored.
        ndim: optional parameter-count check.
        return_parts: also return the ``(bulk, tail)`` arrays.

    Returns:
        ``(ndim,)`` min(bulk, tail) ESS per parameter; with
        ``return_parts=True``, ``(ess, bulk, tail)``.
    """
    chains = np.asarray(chains, dtype=np.float64)
    if chains.ndim == 2:
        chains = chains[..., None]
    nsteps, nwalkers, nd = chains.shape
    if ndim is not None and int(ndim) != nd:
        raise ValueError(
            f"ndim={ndim} does not match the chains' parameter count {nd}."
        )
    split = _split_chains(chains)  # (half, 2*nwalkers, ndim)
    bulk = np.empty(nd)
    tail = np.empty(nd)
    for d in range(nd):
        x = split[..., d]
        if not np.isfinite(x).any():
            bulk[d] = tail[d] = np.nan
            continue
        bulk[d] = _ess_of(_rank_normalize(x))
        with np.errstate(invalid="ignore"):
            qs = np.nanquantile(x, [0.05, 0.95])
        tails = []
        for q in qs:
            ind = np.where(np.isfinite(x), (x <= q).astype(np.float64), np.nan)
            tails.append(_ess_of(ind))
        tail[d] = np.nanmin(tails) if not np.all(np.isnan(tails)) else np.nan
    ess = np.fmin(bulk, tail)
    if return_parts:
        return ess, bulk, tail
    return ess


def replica_round_trips(rungs, ntemps, return_counts=False):
    """Count parallel-tempering replica round trips (beyond the reference).

    A replica's round trip — cold rung -> hottest rung -> back to cold —
    is the unit of tempering work: each trip carries one fresh hot-chain
    exploration down to the cold chain (Syed et al. 2021).  Track replicas
    by riding an integer tag through the swap phases via the state
    supplemental (see ``benchmarks/replica_flow.py`` for the recipe) and
    feed the resulting rung series here.

    Args:
        rungs: ``(nsteps, nreplicas)`` integer rung index per replica per
            step (0 = cold chain).
        ntemps: number of rungs.
        return_counts: also return the per-replica trip counts.

    Returns:
        Total round trips across replicas; with ``return_counts=True``,
        ``(total, (nreplicas,) counts)``.
    """
    rungs = np.asarray(rungs)
    if rungs.ndim != 2:
        raise ValueError(
            f"rungs must be (nsteps, nreplicas), got shape {rungs.shape}."
        )
    nsteps, nreps = rungs.shape
    counts = np.zeros(nreps, dtype=np.int64)
    # event-compressed state machine, vectorized over replicas: only
    # visits to the two extreme rungs matter (-1 = cold, +1 = hottest)
    ev = np.where(rungs == 0, -1, np.where(rungs == ntemps - 1, 1, 0))
    for k in range(nreps):
        e = ev[:, k]
        e = e[e != 0]
        if e.size == 0:
            continue
        # drop consecutive duplicates: transitions only
        e = e[np.concatenate(([True], e[1:] != e[:-1]))]
        # start counting at the first cold visit; each subsequent
        # (+1, -1) pair is one round trip
        first_cold = np.argmax(e == -1) if (e == -1).any() else None
        if first_cold is None:
            continue
        e = e[first_cold:]
        counts[k] = (e[1:] == -1).sum() if e.size > 1 else 0
    total = int(counts.sum())
    if return_counts:
        return total, counts
    return total


_MODERN_DIAG_FNS = None


def _modern_diag_fns():
    """Build (once) the jitted device kernels behind
    :func:`rank_normalized_rhat_jax` / :func:`effective_sample_size_jax`.

    Same math as the host estimators above (Vehtari et al. 2021), expressed
    with static shapes so a :class:`~eryn_tpu.backends.DeviceBackend` chain
    never crosses to the host: the scipy ``rankdata(method="average")`` tie
    handling becomes two ``searchsorted`` passes over the sorted pooled
    draws, the Geyer initial-positive truncation becomes a cumulative
    positivity mask, and dropped all-NaN chains become zero-weight masks.
    jit caches one compilation per (nsteps, nchains, ncols) shape.
    """
    global _MODERN_DIAG_FNS
    if _MODERN_DIAG_FNS is not None:
        return _MODERN_DIAG_FNS
    import jax
    from jax.scipy.special import ndtri

    def rank_z(flat):
        # fractional-rank z-scores of the pooled draws of one parameter;
        # NaN (RJ-masked) entries sort to +inf and stay NaN in the output
        finite = jnp.isfinite(flat)
        S = finite.sum()
        big = jnp.where(finite, flat, jnp.inf)
        srt = jnp.sort(big)
        left = jnp.searchsorted(srt, big, side="left")
        right = jnp.searchsorted(srt, big, side="right")
        r = 0.5 * (left + right + 1).astype(flat.dtype)
        z = ndtri((r - 0.375) / (S + 0.25))
        return jnp.where(finite, z, jnp.nan)

    def basic_rhat(z):
        n = z.shape[0]
        means = jnp.nanmean(z, axis=0)
        variances = jnp.nanvar(z, axis=0, ddof=1)
        W = jnp.nanmean(variances)
        B = n * jnp.nanvar(means, ddof=1)
        return jnp.sqrt(((n - 1.0) / n * W + B / n) / W)

    def ess_of(z):
        n, m = z.shape
        dtype = z.dtype
        if n < 4:  # host _ess_of contract: too short after splitting
            return jnp.asarray(jnp.nan, dtype)
        finite = jnp.isfinite(z)
        chain_keep = finite.any(axis=0)
        kf = chain_keep.astype(dtype)
        mk = kf.sum()
        counts = jnp.maximum(finite.sum(axis=0), 1)
        means = jnp.where(finite, z, 0.0).sum(axis=0) / counts
        zf = jnp.where(finite, z, means[None, :])
        zf = jnp.where(chain_keep[None, :], zf, 0.0)
        variances = zf.var(axis=0, ddof=1)
        W = (variances * kf).sum() / mk
        mbar = (means * kf).sum() / mk
        B_over_n = (kf * (means - mbar) ** 2).sum() / jnp.maximum(mk - 1.0, 1.0)
        var_plus = W * (n - 1.0) / n + B_over_n
        f = jnp.fft.rfft(zf - zf.mean(axis=0, keepdims=True), n=2 * n, axis=0)
        acov = jnp.fft.irfft(f * jnp.conj(f), n=2 * n, axis=0)[:n] / n
        acov_mean = (acov * kf[None, :]).sum(axis=1) / mk
        rho = 1.0 - (W - acov_mean) / var_plus
        # Geyer initial positive pair sums with the monotone adjustment:
        # the data-dependent truncation index becomes a prefix mask
        L = (n - 1) // 2
        pairs = rho[0 : 2 * L : 2] + rho[1 : 2 * L : 2]
        ok = jnp.cumprod((pairs > 0.0).astype(dtype))
        tau_sum = (jnp.minimum.accumulate(pairs) * ok).sum()
        tau = jnp.where(pairs[0] > 0.0, -1.0 + 2.0 * tau_sum, 1.0)
        tau = jnp.maximum(
            tau, 1.0 / jnp.log10(jnp.maximum(n * mk, 10.0))
        )
        ess = n * mk / tau
        bad = (
            (mk < 2.0)
            | ~jnp.isfinite(var_plus)
            | (var_plus <= 0.0)
            | (W <= 0.0)
        )
        return jnp.where(bad, jnp.nan, ess)

    def rhat_col(x2):
        bulk = basic_rhat(rank_z(x2.ravel()).reshape(x2.shape))
        folded = jnp.abs(x2 - jnp.nanmedian(x2))
        tail = basic_rhat(rank_z(folded.ravel()).reshape(x2.shape))
        return bulk, tail

    def ess_col(x2):
        finite = jnp.isfinite(x2)
        any_f = finite.any()
        bulk = ess_of(rank_z(x2.ravel()).reshape(x2.shape))
        qs = jnp.nanquantile(x2, jnp.array([0.05, 0.95], dtype=x2.dtype))
        t0 = ess_of(jnp.where(finite, (x2 <= qs[0]).astype(x2.dtype), jnp.nan))
        t1 = ess_of(jnp.where(finite, (x2 <= qs[1]).astype(x2.dtype), jnp.nan))
        tail = jnp.nanmin(jnp.stack([t0, t1]))
        return (
            jnp.where(any_f, bulk, jnp.nan),
            jnp.where(any_f, tail, jnp.nan),
        )

    def split(vals):
        # _split_chains with static shapes: drop leading odd steps, halve
        nsteps = vals.shape[0]
        half = nsteps // 2
        trimmed = vals[nsteps - 2 * half :]
        return jnp.concatenate([trimmed[:half], trimmed[half:]], axis=1)

    def rhat_all(vals):
        bulk, tail = jax.vmap(rhat_col, in_axes=2)(split(vals))
        return jnp.maximum(bulk, tail), bulk, tail

    def ess_all(vals):
        bulk, tail = jax.vmap(ess_col, in_axes=2)(split(vals))
        return jnp.fmin(bulk, tail), bulk, tail

    _MODERN_DIAG_FNS = (jax.jit(rhat_all), jax.jit(ess_all))
    return _MODERN_DIAG_FNS


def rank_normalized_rhat_jax(chains, return_parts=False):
    """Device-side :func:`rank_normalized_rhat` — the chain stays on
    device; only the ``(ncols,)`` R-hat arrays cross to the host.

    Args:
        chains: ``(nsteps, nwalkers, ncols)`` device array (NaNs for
            RJ-masked entries).
        return_parts: also return the ``(bulk, tail)`` arrays.
    """
    chains = jnp.asarray(chains)
    if chains.shape[0] // 2 < 2:
        raise ValueError(
            f"rank-normalized R-hat needs >= 4 steps, got {chains.shape[0]}."
        )
    rhat, bulk, tail = _modern_diag_fns()[0](chains)
    if return_parts:
        return rhat, bulk, tail
    return rhat


def effective_sample_size_jax(chains, return_parts=False):
    """Device-side :func:`effective_sample_size` — the chain stays on
    device; only the ``(ncols,)`` ESS arrays cross to the host.

    Args:
        chains: ``(nsteps, nwalkers, ncols)`` device array (NaNs for
            RJ-masked entries).
        return_parts: also return the ``(bulk, tail)`` arrays.
    """
    chains = jnp.asarray(chains)
    if chains.shape[0] // 2 < 2:
        raise ValueError(
            f"effective sample size needs >= 4 steps, got {chains.shape[0]}."
        )
    ess, bulk, tail = _modern_diag_fns()[1](chains)
    if return_parts:
        return ess, bulk, tail
    return ess
