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

    matplotlib.use("Agg")
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
    ):
        self.fp = fp
        self.backend = backend
        self.plot_dir = plot_dir
        self.thin_chain_by_ac = thin_chain_by_ac
        self.corner_kwargs = corner_kwargs or {}
        self.parameter_transforms = parameter_transforms
        self.which_plots = which_plots

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
        names = [name] if name else backend.branch_names
        figs = []
        for nm in names:
            samples = _flat_cold_chain(backend, nm, burn, thin)
            if self.parameter_transforms is not None:
                samples = np.asarray(
                    self.parameter_transforms.both_transforms(samples)
                )
            ndim = samples.shape[-1]
            fig, axes = plt.subplots(
                ndim, ndim, figsize=(2.0 * ndim, 2.0 * ndim)
            )
            axes = np.atleast_2d(axes)
            for i in range(ndim):
                for j in range(ndim):
                    ax = axes[i, j]
                    if j > i:
                        ax.set_visible(False)
                    elif i == j:
                        ax.hist(samples[:, i], bins=40, histtype="step")
                    else:
                        ax.hist2d(samples[:, j], samples[:, i], bins=40)
                    if i < ndim - 1:
                        ax.set_xticklabels([])
                    if j > 0:
                        ax.set_yticklabels([])
            fig.suptitle(f"{nm} corner")
            if save:
                fig.savefig(self._path(f"corner_{nm}"))
                plt.close(fig)
            figs.append(fig)
        return figs

    def plot_trace(self, burn=0, thin=1, save=True):
        plt = _get_plt()
        backend = self.backend
        for nm in backend.branch_names:
            chain = backend.get_chain(discard=burn, thin=thin)[nm]
            nsteps, ntemps, nwalkers, nl, nd = chain.shape
            fig, axes = plt.subplots(nd, 1, figsize=(8, 2 * nd), squeeze=False)
            for d in range(nd):
                axes[d, 0].plot(
                    chain[:, 0, :, 0, d], alpha=0.3, lw=0.5, color="k"
                )
                axes[d, 0].set_ylabel(f"param {d}")
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

    def produce_rj_plots(self, burn=0, thin=1):
        self.plot_leaves_hist(burn=burn, thin=thin)
        self.plot_leaves_evolution(burn=burn, thin=thin)

    def produce_advanced_plots(self, burn=0, thin=1):
        self.plot_acceptance_fraction()

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
        if which in ("all", ("all",)):
            which = tuple(groups)
        for key in which:
            try:
                groups[key](burn=burn, thin=thin)
            except AttributeError:
                continue

    # reference-compatible alias
    def generate_plot_info(self, burn=0, thin=1, **kwargs):
        self.produce_plots(burn=burn, thin=thin)
