"""Runtime diagnostic plotting.

Re-design of ``/root/reference/src/eryn/utils/plot.py:989-1392``: corner,
trace, log-likelihood, temperature-ladder/swap diagnostics, leaf-count
histograms and evolution, and acceptance-fraction evolution, grouped into the
same producer families (``produce_base_plots`` / ``produce_tempering_plots`` /
``produce_rj_plots`` / ``produce_advanced_plots``) and driven from a backend
by :class:`PlotContainer.produce_plots`.  Corner panels are drawn with plain
matplotlib (the reference depends on the external ``corner`` package).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["PlotContainer"]


def _get_plt():
    import matplotlib

    # never hijack an interactive session's backend: only force Agg when
    # matplotlib has not yet materialized one
    if "matplotlib.pyplot" not in __import__("sys").modules:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def _flat_cold_chain(backend, name, burn=0, thin=1):
    """(nsamples, ndim) active-leaf samples from the cold chain."""
    chain = backend.get_chain(discard=burn, thin=thin)[name]
    inds = backend.get_inds(discard=burn, thin=thin)[name]
    x = chain[:, 0]
    m = inds[:, 0]
    return x[m]


class PlotContainer:
    """Diagnostic plot driver (ref ``plot.py:1208-1392``).

    Args:
        fp: file prefix for saved figures.
        backend: backend to read chains from.
        plot_dir: directory for output files.
        thin_chain_by_ac: thin by the autocorrelation estimate before
            plotting.
    """

    def __init__(
        self,
        fp="output",
        backend=None,
        plot_dir=".",
        thin_chain_by_ac=False,
        corner_kwargs=None,
        parameter_transforms=None,
        info_keys=None,
        which_plots=("base",),
        plots=None,
        parent_folder=None,
        branches=None,
        truths=None,
        overlay_covariance=None,
    ):
        self.fp = fp
        self.backend = backend
        # reference-compatible aliases (ref plot.py:1223-1233)
        self.plot_dir = parent_folder if parent_folder is not None else plot_dir
        self.thin_chain_by_ac = thin_chain_by_ac
        self.corner_kwargs = corner_kwargs or {}
        self.parameter_transforms = parameter_transforms
        #: {branch: [labels]} parameter names used on axes; falls back to the
        #: backend's persisted prior key_order (ref plot.py:1306)
        self.info_keys = info_keys
        self.which_plots = plots if plots is not None else which_plots
        #: restrict plotting to these branches (None = all)
        self.branches = branches
        #: {branch: (ndim,) true values} drawn as lines on the corner plots
        self.truths = truths
        #: {branch: (ndim, ndim) covariance} 1-sigma Gaussian overlay on the
        #: corner diagonals (ref cornerplot overlay, plot.py:232-241)
        self.overlay_covariance = overlay_covariance
        # acceptance-evolution history accumulated across produce_plots
        # calls (the reference accumulates the same way, plot.py:1344-1364)
        self._steps = []
        self._total_acc_history = None
        self._move_acc_history = {}

    def _labels(self, name, ndim):
        src = self.info_keys
        if src is None:
            src = getattr(self.backend, "key_order", None) or {}
        labels = src.get(name) if isinstance(src, dict) else src
        if labels is not None and len(labels) == ndim:
            return [str(lb) for lb in labels]
        return [f"param {d}" for d in range(ndim)]

    def _path(self, tag):
        os.makedirs(self.plot_dir, exist_ok=True)
        return os.path.join(self.plot_dir, f"{self.fp}_{tag}.png")

    # ------------------------------------------------------------------
    # individual plots
    # ------------------------------------------------------------------
    def generate_corner(self, burn=0, thin=1, name=None, save=True):
        """Corner (pair) plot of the cold chain (ref ``plot.py:989``-family)."""
        plt = _get_plt()
        backend = self.backend
        names = [name] if name else (self.branches or backend.branch_names)
        figs = []
        for nm in names:
            samples = _flat_cold_chain(backend, nm, burn, thin)
            if self.parameter_transforms is not None:
                samples = np.asarray(
                    self.parameter_transforms.both_transforms(samples)
                )
            ndim = samples.shape[-1]
            labels = self._labels(nm, ndim)
            fig, axes = plt.subplots(
                ndim, ndim, figsize=(2.0 * ndim, 2.0 * ndim)
            )
            axes = np.atleast_2d(axes)
            bins = self.corner_kwargs.get("bins", 40)
            hist_kwargs = {
                k: v for k, v in self.corner_kwargs.items() if k != "bins"
            }
            for i in range(ndim):
                for j in range(ndim):
                    ax = axes[i, j]
                    if j > i:
                        ax.set_visible(False)
                    elif i == j:
                        ax.hist(
                            samples[:, i],
                            bins=bins,
                            histtype="step",
                            **hist_kwargs,
                        )
                    else:
                        ax.hist2d(samples[:, j], samples[:, i], bins=bins)
                    if i < ndim - 1:
                        ax.set_xticklabels([])
                    if j > 0:
                        ax.set_yticklabels([])
                    if i == ndim - 1:
                        ax.set_xlabel(labels[j])
                    if j == 0 and i > 0:
                        ax.set_ylabel(labels[i])
            truths = None if self.truths is None else self.truths.get(nm)
            if truths is not None:
                truths = np.atleast_1d(np.asarray(truths, dtype=float))
                for i in range(ndim):
                    for j in range(i + 1):
                        ax = axes[i, j]
                        ax.axvline(truths[j], color="C3", lw=1)
                        if j < i:
                            ax.axhline(truths[i], color="C3", lw=1)
            ocov = (
                None
                if self.overlay_covariance is None
                else self.overlay_covariance.get(nm)
            )
            if ocov is not None:
                ocov = np.asarray(ocov, dtype=float)
                center = (
                    truths
                    if truths is not None
                    else samples.mean(axis=0)
                )
                for i in range(ndim):
                    sd = np.sqrt(ocov[i, i])
                    g = np.linspace(center[i] - 4 * sd, center[i] + 4 * sd, 200)
                    dens = np.exp(-0.5 * ((g - center[i]) / sd) ** 2)
                    ax = axes[i, i]
                    ymax = ax.get_ylim()[1]
                    ax.plot(g, dens * ymax, color="C2", lw=1, ls="--")
            fig.suptitle(f"{nm} corner")
            if save:
                fig.savefig(self._path(f"corner_{nm}"))
                plt.close(fig)
            figs.append(fig)
        return figs

    def plot_trace(self, burn=0, thin=1, save=True):
        plt = _get_plt()
        backend = self.backend
        for nm in self.branches or backend.branch_names:
            chain = backend.get_chain(discard=burn, thin=thin)[nm]
            inds = backend.get_inds(discard=burn, thin=thin)[nm]
            nsteps, ntemps, nwalkers, nl, nd = chain.shape
            labels = self._labels(nm, nd)
            fig, axes = plt.subplots(nd, 1, figsize=(8, 2 * nd), squeeze=False)
            # stale coordinates of INACTIVE leaves must not be plotted
            lead = np.where(inds[:, 0, :, 0, None], chain[:, 0, :, 0, :], np.nan)
            for d in range(nd):
                axes[d, 0].plot(
                    lead[..., d], alpha=0.3, lw=0.5, color="k"
                )
                axes[d, 0].set_ylabel(labels[d])
            fig.suptitle(f"{nm} trace (cold chain)")
            if save:
                fig.savefig(self._path(f"trace_{nm}"))
                plt.close(fig)

    def plot_log_like(self, burn=0, thin=1, save=True):
        plt = _get_plt()
        ll = self.backend.get_log_like(discard=burn, thin=thin)
        fig, ax = plt.subplots()
        ax.plot(ll[:, 0].max(axis=-1), label="cold max")
        ax.plot(ll[:, 0].mean(axis=-1), label="cold mean")
        ax.set_xlabel("iteration")
        ax.set_ylabel("log like")
        ax.legend()
        if save:
            fig.savefig(self._path("log_like"))
            plt.close(fig)

    def plot_betas(self, burn=0, thin=1, save=True):
        """Temperature-ladder evolution (ref tempering plots)."""
        plt = _get_plt()
        betas = self.backend.get_betas(discard=burn, thin=thin)
        fig, ax = plt.subplots()
        with np.errstate(divide="ignore"):
            ax.semilogy(betas)
        ax.set_xlabel("iteration")
        ax.set_ylabel("beta")
        if save:
            fig.savefig(self._path("betas"))
            plt.close(fig)

    def plot_swap_acceptance(self, save=True):
        plt = _get_plt()
        backend = self.backend
        if backend.swaps_accepted is None:
            return
        frac = np.asarray(backend.swaps_accepted) / (
            backend.iteration * backend.nwalkers
        )
        fig, ax = plt.subplots()
        ax.plot(frac, "o-")
        ax.axhline(0.25, ls="--", color="gray")
        ax.set_xlabel("temperature rung")
        ax.set_ylabel("swap acceptance")
        if save:
            fig.savefig(self._path("swap_acceptance"))
            plt.close(fig)

    def plot_leaves_hist(self, burn=0, thin=1, save=True):
        plt = _get_plt()
        backend = self.backend
        nleaves = backend.get_nleaves(discard=burn, thin=thin)
        for nm, nl in nleaves.items():
            fig, ax = plt.subplots()
            vals = nl[:, 0].flatten()
            bins = np.arange(vals.min() - 0.5, vals.max() + 1.5)
            ax.hist(vals, bins=bins)
            ax.set_xlabel("leaf count")
            ax.set_title(f"{nm} leaves (cold chain)")
            if save:
                fig.savefig(self._path(f"leaves_{nm}"))
                plt.close(fig)

    def plot_leaves_evolution(self, burn=0, thin=1, save=True):
        plt = _get_plt()
        nleaves = self.backend.get_nleaves(discard=burn, thin=thin)
        for nm, nl in nleaves.items():
            fig, ax = plt.subplots()
            ax.plot(nl[:, 0].mean(axis=-1))
            ax.set_xlabel("iteration")
            ax.set_ylabel("mean leaf count")
            ax.set_title(nm)
            if save:
                fig.savefig(self._path(f"leaves_evolution_{nm}"))
                plt.close(fig)

    def plot_acceptance_fraction(self, save=True):
        plt = _get_plt()
        backend = self.backend
        frac = np.asarray(backend.accepted) / max(backend.iteration, 1)
        fig, ax = plt.subplots()
        ax.plot(frac.mean(axis=-1), "o-")
        ax.set_xlabel("temperature")
        ax.set_ylabel("mean acceptance fraction")
        if save:
            fig.savefig(self._path("acceptance"))
            plt.close(fig)

    def plot_tempering_ridgeline(self, burn=0, thin=1, max_samples=10000, save=True):
        """Ridgeline ("joy") plot: per-parameter KDEs stacked by temperature,
        showing the posterior broadening up the ladder
        (ref ``plot.py:409-566``; plain-matplotlib KDE instead of seaborn)."""
        try:
            from scipy.stats import gaussian_kde
        except ImportError:  # scipy is an optional extra
            import warnings

            warnings.warn(
                "scipy not available; skipping the tempering ridgeline plot.",
                stacklevel=2,
            )
            return

        plt = _get_plt()
        backend = self.backend
        rng = np.random.default_rng(42)
        for nm in self.branches or backend.branch_names:
            chain = backend.get_chain(discard=burn, thin=thin)[nm]
            inds = backend.get_inds(discard=burn, thin=thin)[nm]
            # stale inactive-leaf slots are finite junk: NaN-mask them so
            # the per-temperature densities only see live samples
            chain = np.where(inds[..., None], chain, np.nan)
            nsteps, ntemps, nwalkers, nl, nd = chain.shape
            labels = self._labels(nm, nd)
            fig, axes = plt.subplots(
                ntemps,
                nd,
                figsize=(3.0 * nd, 0.7 * ntemps),
                sharex="col",
                squeeze=False,
            )
            cmap = plt.get_cmap("coolwarm")
            for d in range(nd):
                lo, hi = None, None
                for t in range(ntemps):
                    samples = chain[:, t, :, :, d].reshape(-1)
                    samples = samples[np.isfinite(samples)]
                    if samples.size > max_samples:
                        samples = rng.choice(samples, max_samples, replace=False)
                    ax = axes[t, d]
                    color = cmap(t / max(ntemps - 1, 1))
                    if samples.size > 4 and samples.std() > 0:
                        grid = np.linspace(
                            samples.min(), samples.max(), 200
                        )
                        dens = gaussian_kde(samples, bw_method=0.25)(grid)
                        ax.fill_between(grid, dens, color=color, alpha=0.8)
                        lo = grid[0] if lo is None else min(lo, grid[0])
                        hi = grid[-1] if hi is None else max(hi, grid[-1])
                    ax.set_yticks([])
                    for side in ("top", "right", "left"):
                        ax.spines[side].set_visible(False)
                    if d == 0:
                        ax.set_ylabel(
                            rf"$\beta_{{{t}}}$", rotation=0, ha="right"
                        )
                axes[-1, d].set_xlabel(labels[d])
            fig.suptitle(f"{nm} tempering ridgeline")
            fig.subplots_adjust(hspace=-0.2)
            if save:
                fig.savefig(self._path(f"ridgeline_{nm}"))
                plt.close(fig)

    def plot_logl_betas(self, burn=0, thin=1, save=True):
        """Mean tempered log-likelihood per rung vs beta, with the
        stepping-stone evidence in the title (ref ``plot.py:633-661``)."""
        from .utility import stepping_stone_log_evidence

        plt = _get_plt()
        backend = self.backend
        logl = backend.get_log_like(discard=burn, thin=thin)
        betas = backend.get_betas(discard=burn, thin=thin)
        ntemps = betas.shape[1]
        if ntemps < 2:
            return
        fig, ax = plt.subplots(figsize=(8, 5))
        cmap = plt.get_cmap("coolwarm")
        for t in range(ntemps):
            ax.semilogx(
                max(betas[-1, t], 1e-12),
                np.mean(logl[:, t]),
                ".",
                ms=10,
                color=cmap(t / max(ntemps - 1, 1)),
            )
        title = "mean log-like vs beta"
        try:
            logZ, dlogZ = stepping_stone_log_evidence(betas[-1], logl)
            title = rf"$\log Z$ = {logZ:.2f} $\pm$ {dlogZ:.2f}"
        except Exception:
            pass
        ax.set_xlabel(r"$\beta$")
        ax.set_ylabel(r"$\langle \log L \rangle_\beta$")
        ax.set_title(title)
        if save:
            fig.savefig(self._path("logl_betas"))
            plt.close(fig)

    def _record_acceptance_history(self):
        backend = self.backend
        it = max(backend.iteration, 1)
        self._steps.append(backend.iteration)
        total = (np.asarray(backend.accepted) / float(it))[None]
        if self._total_acc_history is None:
            self._total_acc_history = total
        else:
            self._total_acc_history = np.vstack(
                [self._total_acc_history, total]
            )
        fractions = getattr(backend, "moves_accepted_fraction", None)
        if fractions:
            for key, val in fractions.items():
                val = np.asarray(val)[None]
                if key not in self._move_acc_history:
                    self._move_acc_history[key] = val
                else:
                    self._move_acc_history[key] = np.vstack(
                        [self._move_acc_history[key], val]
                    )

    def plot_acceptance_evolution(self, save=True):
        """Cold-chain total (+ per-move) acceptance fraction over sampler
        iterations (ref ``plot.py:813-840``); history is accumulated across
        ``produce_plots`` calls."""
        if self._total_acc_history is None:
            self._record_acceptance_history()
        plt = _get_plt()
        fig, ax = plt.subplots(figsize=(8, 5))
        ax.plot(
            self._steps,
            self._total_acc_history[:, 0].mean(axis=-1),
            color="black",
            lw=2,
            label="Total",
        )
        for key, hist in self._move_acc_history.items():
            if hist.shape[0] == len(self._steps):
                ax.plot(
                    self._steps, hist[:, 0].mean(axis=-1), "o-", label=key
                )
        ax.axhline(0.234, color="gray", ls="--", lw=1, alpha=0.7)
        ax.set_xlabel("sampler iteration")
        ax.set_ylabel("acceptance fraction")
        ax.legend()
        if save:
            fig.savefig(self._path("acceptance_evolution"))
            plt.close(fig)

    def plot_tempered_acceptance_evolution(self, save=True):
        """Per-temperature acceptance fraction over iterations
        (ref ``plot.py:841-904``)."""
        if self._total_acc_history is None:
            self._record_acceptance_history()
        plt = _get_plt()
        hist = self._total_acc_history
        ntemps = hist.shape[1]
        cmap = plt.get_cmap("coolwarm")
        fig, ax = plt.subplots(figsize=(8, 5))
        for t in range(ntemps):
            ax.plot(
                self._steps,
                hist[:, t].mean(axis=-1),
                "o-",
                color=cmap(t / max(ntemps - 1, 1)),
                alpha=0.8,
            )
        ax.set_xlabel("sampler iteration")
        ax.set_ylabel("acceptance fraction")
        ax.set_title("acceptance per temperature (blue=cold, red=hot)")
        if save:
            fig.savefig(self._path("acceptance_tempered_evolution"))
            plt.close(fig)

    def plot_act_evolution(self, burn=0, thin=1, npoints=10, save=True):
        """Integrated-ACT estimate on growing chain prefixes plus the final
        per-parameter values (ref ``plot.py:906-988``)."""
        from .utility import get_integrated_act

        plt = _get_plt()
        backend = self.backend
        chain = backend.get_chain(discard=burn, thin=thin)
        for nm, samples in chain.items():
            nsteps, ntemps, nwalkers, nl, nd = samples.shape
            if nsteps < 8:
                continue
            points = np.unique(
                np.exp(
                    np.linspace(
                        np.log(min(100, nsteps)), np.log(nsteps), npoints
                    )
                ).astype(int)
            )
            taus = []
            for n in points:
                tau_n = get_integrated_act(
                    {nm: samples[:n, :1]}
                )[nm]
                taus.append(np.nanmax(tau_n))
            fig, axes = plt.subplots(1, 2, figsize=(11, 4))
            axes[0].loglog(points, taus, "o-")
            axes[0].loglog(
                points, np.asarray(points) / 50.0, "--", color="gray",
                label=r"$\tau = N/50$",
            )
            axes[0].set_xlabel("chain length")
            axes[0].set_ylabel(r"max $\hat\tau$")
            axes[0].legend()
            tau_final = get_integrated_act({nm: samples[:, :1]})[nm]
            vals = np.asarray(tau_final).reshape(-1)
            axes[1].bar(np.arange(vals.size), vals)
            axes[1].set_xticks(np.arange(vals.size))
            axes[1].set_xticklabels(
                self._labels(nm, nd) * nl if vals.size == nd * nl else None,
                rotation=45,
            )
            axes[1].set_ylabel(r"$\hat\tau$ per parameter")
            fig.suptitle(f"{nm} autocorrelation evolution")
            if save:
                fig.savefig(self._path(f"act_evolution_{nm}"))
                plt.close(fig)

    # ------------------------------------------------------------------
    # grouped producers (ref plot.py:989-1206)
    # ------------------------------------------------------------------
    def produce_base_plots(self, burn=0, thin=1):
        self.generate_corner(burn=burn, thin=thin)
        self.plot_trace(burn=burn, thin=thin)
        self.plot_log_like(burn=burn, thin=thin)

    def produce_tempering_plots(self, burn=0, thin=1):
        self.plot_betas(burn=burn, thin=thin)
        self.plot_swap_acceptance()
        self.plot_logl_betas(burn=burn, thin=thin)
        self.plot_tempering_ridgeline(burn=burn, thin=thin)

    def produce_rj_plots(self, burn=0, thin=1):
        self.plot_leaves_hist(burn=burn, thin=thin)
        self.plot_leaves_evolution(burn=burn, thin=thin)

    def produce_advanced_plots(self, burn=0, thin=1):
        self._record_acceptance_history()
        self.plot_acceptance_fraction()
        self.plot_acceptance_evolution()
        self.plot_tempered_acceptance_evolution()
        self.plot_act_evolution(burn=burn, thin=thin)

    def produce_plots(self, burn=0, thin=1):
        """Drive all configured plot groups from the backend
        (ref ``plot.py:1208-1392``)."""
        if self.backend is None or self.backend.iteration <= 0:
            return
        if self.thin_chain_by_ac:
            try:
                burn, thin = self.backend.get_autocorr_thin_burn()
            except Exception:
                pass
        groups = {
            "base": self.produce_base_plots,
            "tempering": self.produce_tempering_plots,
            "rj": self.produce_rj_plots,
            "advanced": self.produce_advanced_plots,
        }
        which = self.which_plots
        if isinstance(which, str):
            # a bare string must select the GROUP, not iterate characters
            which = tuple(groups) if which == "all" else (which,)
        elif "all" in which:
            which = tuple(groups)
        for key in which:
            try:
                groups[key](burn=burn, thin=thin)
            except Exception as e:  # noqa: BLE001
                # runtime plotting must never abort a sampling run
                import warnings

                warnings.warn(
                    f"plot group '{key}' failed: {e!r}", stacklevel=2
                )
                continue

    # reference-compatible alias
    def generate_plot_info(self, burn=0, thin=1, **kwargs):
        self.produce_plots(burn=burn, thin=thin)
