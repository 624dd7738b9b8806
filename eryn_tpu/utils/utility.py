"""Diagnostics and ensemble utilities.

Re-design of ``/root/reference/src/eryn/utils/utility.py:8-330``.  Host-side
post-processing diagnostics run in NumPy; ``groups_from_inds`` additionally
has a traced variant (segment ids instead of ``np.unique``) so grouping can
live inside jitted likelihood wrappers.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = [
    "groups_from_inds",
    "groups_from_inds_jax",
    "get_acf",
    "get_integrated_act",
    "thermodynamic_integration_log_evidence",
    "stepping_stone_log_evidence",
    "psrf",
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
    """FFT-based autocorrelation function (ref ``utility.py:43-76``)."""
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    m = [slice(None)] * len(x.shape)
    n = x.shape[axis]
    if fast:
        n = int(2 ** np.floor(np.log2(n)))
        m[axis] = slice(0, n)
        x = x[tuple(m)]
    f = np.fft.fft(x - np.mean(x, axis=axis, keepdims=True), n=2 * n, axis=axis)
    m[axis] = slice(0, n)
    acf = np.fft.ifft(f * np.conjugate(f), axis=axis)[tuple(m)].real
    m[axis] = slice(0, 1)
    return acf / acf[tuple(m)]


def _sokal_window(taus, c):
    m = np.arange(len(taus)) < c * taus
    if np.any(m):
        return int(np.argmin(m))
    return len(taus) - 1


def get_integrated_act(x, average=True, c=5, tol=0, quiet=True, has_walkers=True):
    """Integrated autocorrelation time with a Sokal window
    (ref ``utility.py:79-144``).

    Args:
        x: chain array. Leading axis = steps; if ``has_walkers`` the second
           non-temp axis is averaged as independent walkers. Accepts
           ``(nsteps, ...)`` of any trailing shape or a dict of such arrays.
    """
    if isinstance(x, dict):
        return {k: get_integrated_act(v, average=average, c=c) for k, v in x.items()}

    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    nsteps = x.shape[0]
    flat = x.reshape(nsteps, -1)

    # average ACF over all chains (walkers/temps/leaves) per parameter is the
    # standard emcee estimator; here each flat column is a chain
    acf = np.zeros(nsteps)
    valid = 0
    for j in range(flat.shape[1]):
        col = flat[:, j]
        good = np.isfinite(col)
        if good.sum() < 4:
            continue
        col = np.where(good, col, np.nanmean(col))
        acf += get_acf(col)
        valid += 1
    if valid == 0:
        return np.nan
    acf /= valid

    taus = 2.0 * np.cumsum(acf) - 1.0
    window = _sokal_window(taus, c)
    tau = taus[window]
    if tol > 0 and not quiet and tau * tol > nsteps:
        raise RuntimeError(
            f"The chain is shorter than {tol} times the integrated "
            f"autocorrelation time ({tau:.1f})."
        )
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


def psrf(chains, ndim=None, per_walker=False):
    """Gelman-Rubin potential scale reduction factor R-hat
    (ref ``utility.py:279-330``).

    Args:
        chains: ``(nsteps, nwalkers, ndim)`` samples (NaNs allowed for
            RJ-masked entries; they are ignored).

    Returns:
        ``(ndim,)`` R-hat per parameter.
    """
    chains = np.asarray(chains, dtype=np.float64)
    nsteps, nwalkers, nd = chains.shape
    with np.errstate(invalid="ignore"):
        means = np.nanmean(chains, axis=0)  # (nwalkers, ndim)
        variances = np.nanvar(chains, axis=0, ddof=1)
        W = np.nanmean(variances, axis=0)
        B = nsteps * np.nanvar(means, axis=0, ddof=1)
        var_est = (1.0 - 1.0 / nsteps) * W + B / nsteps
        Rhat = np.sqrt(var_est / W)
    return Rhat
