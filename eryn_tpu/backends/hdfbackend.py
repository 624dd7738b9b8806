"""HDF5 chain storage backend with checkpoint/resume.

Behavioral re-design of
``/root/reference/src/eryn/backends/hdfbackend.py:42-834`` writing the same
file schema (group ``name`` with attrs ``version/nbranches/branch_names/
ntemps/nwalkers/has_blobs/rj/iteration``, resizable ``log_like/log_prior/
betas`` datasets, ``chain/<branch>`` and ``inds/<branch>`` groups,
``accepted``/``swaps_accepted``/``rj_accepted`` counters and per-move
``moves/<name>/acceptance_fraction``), so chains written here can be read by
reference-era tooling.  The sampler's PRNG key is persisted where the
reference stores the NumPy RandomState tuple (``hdfbackend.py:782-783``).
"""

from __future__ import annotations

import os
import time

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

from .backend import Backend
from ..state import State

__all__ = ["HDFBackend", "TempHDFBackend", "does_hdf5_support_longdouble"]


def does_hdf5_support_longdouble():
    """Probe longdouble support (ref ``hdfbackend.py:23-39``)."""
    if h5py is None:
        return False
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".h5", delete=False) as tmp:
        path = tmp.name
    try:
        with h5py.File(path, "w") as hf:
            g = hf.create_group("group")
            g.create_dataset("data", data=np.ones(1, dtype=np.longdouble))
        with h5py.File(path, "r") as hf:
            return hf["group"]["data"].dtype == np.longdouble
    finally:
        os.remove(path)


_OPEN_RETRIES = 100
_OPEN_RETRY_SLEEP = 0.1


class HDFBackend(Backend):
    """HDF5 file backend (ref ``hdfbackend.py:42``).

    Args:
        filename: path of the HDF5 file.
        name: group name inside the file (default ``"mcmc"``).
        read_only: open the file read-only.
        compression / compression_opts: h5py dataset options.
    """

    def __init__(
        self,
        filename,
        name="mcmc",
        read_only=False,
        dtype=None,
        compression=None,
        compression_opts=None,
        store_missing_leaves=np.nan,
    ):
        if h5py is None:
            raise ImportError("You must install 'h5py' to use the HDFBackend")
        self.filename = filename
        self.name = name
        self.read_only = read_only
        self.compression = compression
        self.compression_opts = compression_opts
        self.store_missing_leaves = store_missing_leaves
        self.dtype = dtype if dtype is not None else np.float64

    @property
    def initialized(self):
        if not os.path.exists(self.filename):
            return False
        try:
            with self.open() as f:
                return self.name in f
        except (OSError, IOError):
            return False

    def open(self, mode="r"):
        """Open with a BlockingIOError retry loop
        (ref ``hdfbackend.py:133-147``)."""
        if self.read_only and mode != "r":
            raise RuntimeError(
                "The backend has been loaded in read-only mode. Set "
                "`read_only = False` to make changes."
            )
        for attempt in range(_OPEN_RETRIES):
            try:
                return h5py.File(self.filename, mode)
            except BlockingIOError:
                if attempt == _OPEN_RETRIES - 1:
                    raise
                time.sleep(_OPEN_RETRY_SLEEP)

    # ------------------------------------------------------------------
    def reset(
        self,
        nwalkers,
        ndims,
        nleaves_max=1,
        ntemps=1,
        branch_names=None,
        nbranches=1,
        rj=False,
        moves=None,
        info=None,
        key_order=None,
    ):
        """Create the file layout (ref ``hdfbackend.py:169-397``)."""
        if branch_names is None:
            branch_names = [f"model_{i}" for i in range(nbranches)]
        if isinstance(branch_names, str):
            branch_names = [branch_names]

        def to_dict(val):
            if isinstance(val, (int, np.integer)):
                return {bn: int(val) for bn in branch_names}
            if isinstance(val, (list, np.ndarray)):
                return {bn: int(v) for bn, v in zip(branch_names, val)}
            return {k: int(v) for k, v in val.items()}

        self.nwalkers = int(nwalkers)
        self.ntemps = int(ntemps)
        self.branch_names = list(branch_names)
        self.nbranches = len(branch_names)
        self.ndims = to_dict(ndims)
        self.nleaves_max = to_dict(nleaves_max)
        self.rj = rj
        self.move_keys = list(moves) if moves else None

        from .. import __version__

        with self.open("a") as f:
            if self.name in f:
                del f[self.name]
            g = f.create_group(self.name)
            g.attrs["version"] = __version__
            g.attrs["nbranches"] = len(branch_names)
            g.attrs["branch_names"] = branch_names
            g.attrs["ntemps"] = ntemps
            g.attrs["nwalkers"] = nwalkers
            g.attrs["has_blobs"] = False
            g.attrs["rj"] = rj
            g.attrs["iteration"] = 0

            g.create_group("info")
            for key, value in (info or {}).items():
                try:
                    g["info"].attrs[key] = value
                except TypeError:
                    pass

            g.create_group("ndims")
            for key, value in self.ndims.items():
                g["ndims"].attrs[key] = value
            g.create_group("nleaves_max")
            for key, value in self.nleaves_max.items():
                g["nleaves_max"].attrs[key] = value

            opts = dict(
                compression=self.compression,
                compression_opts=self.compression_opts,
            )
            g.create_dataset(
                "accepted", data=np.zeros((ntemps, nwalkers)), **opts
            )
            g.create_dataset(
                "swaps_accepted", data=np.zeros((max(ntemps - 1, 0),)), **opts
            )
            if rj:
                g.create_dataset(
                    "rj_accepted", data=np.zeros((ntemps, nwalkers)), **opts
                )
            g.create_dataset(
                "log_like",
                (0, ntemps, nwalkers),
                maxshape=(None, ntemps, nwalkers),
                dtype=self.dtype,
                **opts,
            )
            g.create_dataset(
                "log_prior",
                (0, ntemps, nwalkers),
                maxshape=(None, ntemps, nwalkers),
                dtype=self.dtype,
                **opts,
            )
            g.create_dataset(
                "betas",
                (0, ntemps),
                maxshape=(None, ntemps),
                dtype=self.dtype,
                **opts,
            )

            chain = g.create_group("chain")
            inds = g.create_group("inds")
            k_o_g = g.create_group("key_order")
            for name in branch_names:
                nleaves = self.nleaves_max[name]
                ndim = self.ndims[name]
                chain.create_dataset(
                    name,
                    (0, ntemps, nwalkers, nleaves, ndim),
                    maxshape=(None, ntemps, nwalkers, nleaves, ndim),
                    dtype=self.dtype,
                    **opts,
                )
                inds.create_dataset(
                    name,
                    (0, ntemps, nwalkers, nleaves),
                    maxshape=(None, ntemps, nwalkers, nleaves),
                    dtype=bool,
                    **opts,
                )
                if (
                    key_order is not None
                    and name in key_order
                    and len(key_order[name]) > 0
                ):
                    k_o_g.attrs[name] = key_order[name]

            if moves is not None:
                move_group = g.create_group("moves")
                for full_move_name in moves:
                    single_move = move_group.create_group(full_move_name)
                    single_move.create_dataset(
                        "acceptance_fraction",
                        (ntemps, nwalkers),
                        maxshape=(ntemps, nwalkers),
                        dtype=self.dtype,
                        **opts,
                    )

    # ------------------------------------------------------------------
    # lazy attribute mirrors (ref hdfbackend.py:399-485)
    # ------------------------------------------------------------------
    def _attr(self, name):
        with self.open() as f:
            return f[self.name].attrs[name]

    def __getattr__(self, item):
        # only called when normal lookup fails — lazily hydrate file-backed
        # metadata attributes
        if item in (
            "nwalkers",
            "ntemps",
            "rj",
            "nbranches",
        ):
            return self._attr(item)
        if item == "branch_names":
            return list(self._attr("branch_names"))
        if item == "ndims":
            with self.open() as f:
                return {
                    key: int(f[self.name]["ndims"].attrs[key])
                    for key in f[self.name]["ndims"].attrs
                }
        if item == "nleaves_max":
            with self.open() as f:
                return {
                    key: int(f[self.name]["nleaves_max"].attrs[key])
                    for key in f[self.name]["nleaves_max"].attrs
                }
        if item == "move_keys":
            with self.open() as f:
                g = f[self.name]
                return list(g["moves"].keys()) if "moves" in g else None
        if item == "key_order":
            with self.open() as f:
                g = f[self.name]
                if "key_order" not in g:
                    return None
                return {
                    key: list(np.atleast_1d(value))
                    for key, value in g["key_order"].attrs.items()
                }
        if item == "info":
            with self.open() as f:
                return dict(f[self.name]["info"].attrs)
        raise AttributeError(item)

    @property
    def iteration(self):
        return int(self._attr("iteration"))

    @property
    def random_state(self):
        # the attr deliberately does NOT start with ``random_state_``: the
        # reference's random_state property collects every attr with that
        # prefix into a Mersenne state tuple (ref hdfbackend.py:636-644),
        # so a JAX key stored under such a name would crash a reference
        # sampler resuming one of our files ("prng_state_key" is invisible
        # to that scan; reference falls back to fresh numpy entropy)
        with self.open() as f:
            g = f[self.name]
            for attr in ("prng_state_key", "random_state_key"):  # new, legacy
                if attr in g.attrs:
                    return np.asarray(g.attrs[attr])
            return None

    def has_blobs(self):
        return bool(self._attr("has_blobs"))

    # ------------------------------------------------------------------
    def grow(self, ngrow, blobs=None):
        """Resize datasets by ``ngrow`` steps (ref ``hdfbackend.py:650-723``)."""
        with self.open("a") as f:
            g = f[self.name]
            ntot = g.attrs["iteration"] + int(ngrow)
            g["log_like"].resize(ntot, axis=0)
            g["log_prior"].resize(ntot, axis=0)
            g["betas"].resize(ntot, axis=0)
            for name in g.attrs["branch_names"]:
                g["chain"][name].resize(ntot, axis=0)
                g["inds"][name].resize(ntot, axis=0)
            if blobs is not None:
                blobs = np.asarray(blobs)
                has_blobs = g.attrs["has_blobs"]
                if not has_blobs:
                    g.create_dataset(
                        "blobs",
                        (ntot,) + blobs.shape,
                        maxshape=(None,) + blobs.shape,
                        dtype=blobs.dtype,
                        compression=self.compression,
                        compression_opts=self.compression_opts,
                    )
                    g.attrs["has_blobs"] = True
                else:
                    g["blobs"].resize(ntot, axis=0)

    # ------------------------------------------------------------------
    def save_snapshot(
        self,
        coords,
        inds,
        log_like,
        log_prior,
        betas=None,
        blobs=None,
        accepted=None,
        rj_accepted=None,
        swaps_accepted=None,
        moves_accepted_fraction=None,
        random_state=None,
    ):
        """Append one stored step with the reference's BlockingIOError retry
        (ref ``hdfbackend.py:725-807``)."""
        for attempt in range(_OPEN_RETRIES):
            try:
                self._save_snapshot_once(
                    coords,
                    inds,
                    log_like,
                    log_prior,
                    betas,
                    blobs,
                    accepted,
                    rj_accepted,
                    swaps_accepted,
                    moves_accepted_fraction,
                    random_state,
                )
                return
            except BlockingIOError:
                if attempt == _OPEN_RETRIES - 1:
                    raise
                time.sleep(_OPEN_RETRY_SLEEP)

    def _save_snapshot_once(
        self,
        coords,
        inds,
        log_like,
        log_prior,
        betas,
        blobs,
        accepted,
        rj_accepted,
        swaps_accepted,
        moves_accepted_fraction,
        random_state,
    ):
        with self.open("a") as f:
            g = f[self.name]
            it = g.attrs["iteration"]
            for name in g.attrs["branch_names"]:
                c = np.asarray(coords[name], dtype=self.dtype).copy()
                m = np.asarray(inds[name], dtype=bool)
                c[~m] = self.store_missing_leaves
                g["chain"][name][it] = c
                g["inds"][name][it] = m
            g["log_like"][it] = np.asarray(log_like, dtype=self.dtype)
            g["log_prior"][it] = np.asarray(log_prior, dtype=self.dtype)
            if betas is not None:
                g["betas"][it] = np.asarray(betas, dtype=self.dtype)
            if blobs is not None and g.attrs["has_blobs"]:
                g["blobs"][it] = np.asarray(blobs)
            if accepted is not None:
                g["accepted"][:] = g["accepted"][:] + np.asarray(accepted)
            if rj_accepted is not None and "rj_accepted" in g:
                g["rj_accepted"][:] = g["rj_accepted"][:] + np.asarray(rj_accepted)
            if swaps_accepted is not None:
                g["swaps_accepted"][:] = g["swaps_accepted"][:] + np.asarray(
                    swaps_accepted
                )
            if moves_accepted_fraction is not None and "moves" in g:
                for key, val in moves_accepted_fraction.items():
                    if val is not None and key in g["moves"]:
                        g["moves"][key]["acceptance_fraction"][:] = np.asarray(
                            val
                        )
            if random_state is not None:
                g.attrs["prng_state_key"] = np.asarray(random_state)
            g.attrs["iteration"] = it + 1

    def save_segment(
        self,
        coords,
        inds,
        log_like,
        log_prior,
        betas=None,
        blobs=None,
        accepted=None,
        rj_accepted=None,
        swaps_accepted=None,
        moves_accepted_fraction=None,
        random_state=None,
    ):
        """Append a whole segment in ONE file open + slab dataset writes.

        The reference appends one step per ``save_step`` call, each with its
        own open/retry (``/root/reference/src/eryn/backends/hdfbackend.py:725-807``);
        the stored layout here is identical, but a device segment of
        ``nstored`` steps costs a single open and ``O(ndatasets)`` writes.
        """
        for attempt in range(_OPEN_RETRIES):
            try:
                self._save_segment_once(
                    coords,
                    inds,
                    log_like,
                    log_prior,
                    betas,
                    blobs,
                    accepted,
                    rj_accepted,
                    swaps_accepted,
                    moves_accepted_fraction,
                    random_state,
                )
                return
            except BlockingIOError:
                if attempt == _OPEN_RETRIES - 1:
                    raise
                time.sleep(_OPEN_RETRY_SLEEP)

    def _save_segment_once(
        self,
        coords,
        inds,
        log_like,
        log_prior,
        betas,
        blobs,
        accepted,
        rj_accepted,
        swaps_accepted,
        moves_accepted_fraction,
        random_state,
    ):
        log_like = np.asarray(log_like, dtype=self.dtype)
        n = log_like.shape[0]
        with self.open("a") as f:
            g = f[self.name]
            it = g.attrs["iteration"]
            sl = slice(it, it + n)
            for name in g.attrs["branch_names"]:
                c = np.asarray(coords[name], dtype=self.dtype).copy()
                m = np.asarray(inds[name], dtype=bool)
                c[~m] = self.store_missing_leaves
                g["chain"][name][sl] = c
                g["inds"][name][sl] = m
            g["log_like"][sl] = log_like
            g["log_prior"][sl] = np.asarray(log_prior, dtype=self.dtype)
            if betas is not None:
                g["betas"][sl] = np.asarray(betas, dtype=self.dtype)
            if blobs is not None and g.attrs["has_blobs"]:
                g["blobs"][sl] = np.asarray(blobs)
            if accepted is not None:
                g["accepted"][:] = g["accepted"][:] + np.asarray(accepted).sum(
                    axis=0
                )
            if rj_accepted is not None and "rj_accepted" in g:
                g["rj_accepted"][:] = g["rj_accepted"][:] + np.asarray(
                    rj_accepted
                ).sum(axis=0)
            if swaps_accepted is not None:
                g["swaps_accepted"][:] = g["swaps_accepted"][:] + np.asarray(
                    swaps_accepted
                ).sum(axis=0)
            if moves_accepted_fraction is not None and "moves" in g:
                for key, val in moves_accepted_fraction.items():
                    if val is not None and key in g["moves"]:
                        g["moves"][key]["acceptance_fraction"][:] = np.asarray(
                            val
                        )
            if random_state is not None:
                g.attrs["prng_state_key"] = np.asarray(random_state)
            g.attrs["iteration"] = it + n

    # ------------------------------------------------------------------
    @staticmethod
    def _sorted_read_plan(idx):
        """(unique-sorted read indices, inverse map restoring the requested
        order incl. duplicates) for h5py's increasing-indices requirement."""
        uniq, inverse = np.unique(idx, return_inverse=True)
        return uniq, inverse

    def get_value(
        self,
        name,
        thin=1,
        discard=0,
        temp_index=None,
        branch_names=None,
        slice_vals=None,
    ):
        """Read values directly from the file (ref ``hdfbackend.py:487-564``)."""
        with self.open() as f:
            g = f[self.name]
            iteration = g.attrs["iteration"]
            if iteration <= 0:
                raise AttributeError(
                    "You must run the sampler with 'store == True' before "
                    "accessing the results."
                )
            if slice_vals is None:
                slice_vals = slice(discard + thin - 1, iteration, thin)
            # h5py fancy indexing requires strictly increasing indices and
            # forward slices; normalize arbitrary slice_vals (unsorted index
            # arrays, descending slices) to a sorted read + reorder, like
            # the in-memory backends
            inv = None
            if isinstance(slice_vals, slice):
                if (slice_vals.step or 1) < 0:
                    idx = np.arange(iteration)[slice_vals]
                    slice_vals, inv = self._sorted_read_plan(idx)
            elif isinstance(slice_vals, (int, np.integer)) or (
                isinstance(slice_vals, np.ndarray) and slice_vals.ndim == 0
            ):
                # scalar step index: resolve negatives against the STORED
                # range (the datasets are preallocated longer) and let h5py
                # drop the step axis as before
                iv = int(slice_vals)
                slice_vals = iv + iteration if iv < 0 else iv
            else:
                idx = np.asarray(slice_vals)
                if idx.dtype == bool:
                    idx = np.flatnonzero(idx)
                if idx.size and (
                    np.any(np.diff(idx) <= 0) or np.any(idx < 0)
                ):
                    idx = np.where(idx < 0, idx + iteration, idx)
                    slice_vals, inv = self._sorted_read_plan(idx)

            if branch_names is None:
                keep_branches = list(g.attrs["branch_names"])
            elif isinstance(branch_names, str):
                keep_branches = [branch_names]
            else:
                keep_branches = list(branch_names)

            def read(dset):
                # slice the temperature at the file level too, so a
                # cold-chain read of a big file moves 1/ntemps of the bytes
                if temp_index is None:
                    out = dset[slice_vals]
                else:
                    out = dset[slice_vals, temp_index]
                return out if inv is None else out[inv]

            if name == "chain":
                return {n: read(g["chain"][n]) for n in keep_branches}
            if name == "inds":
                return {n: read(g["inds"][n]) for n in keep_branches}
            if name == "blobs":
                if not g.attrs["has_blobs"]:
                    raise AttributeError("No blobs stored.")
                return read(g["blobs"])
            if name in ("log_like", "log_prior", "betas"):
                return read(g[name])
            raise ValueError(f"Unknown value name: {name}")

    @property
    def accepted(self):
        with self.open() as f:
            return f[self.name]["accepted"][:]

    @property
    def rj_accepted(self):
        with self.open() as f:
            g = f[self.name]
            return g["rj_accepted"][:] if "rj_accepted" in g else None

    @property
    def swaps_accepted(self):
        with self.open() as f:
            return f[self.name]["swaps_accepted"][:]

    @property
    def moves_accepted_fraction(self):
        with self.open() as f:
            g = f[self.name]
            if "moves" not in g:
                return None
            return {
                key: g["moves"][key]["acceptance_fraction"][:]
                for key in g["moves"]
            }

    def get_a_sample(self, it):
        """Reconstruct the State stored at iteration ``it``
        (ref ``hdfbackend.py:566-644``)."""
        with self.open() as f:
            g = f[self.name]
            iteration = int(g.attrs["iteration"])
            if iteration <= 0:
                raise AttributeError(
                    "You must run the sampler with 'store == True' before "
                    "accessing the results."
                )
            # resolve against the STORED range: datasets are preallocated to
            # the full run length, so raw indexing could silently return
            # unwritten rows after an interrupted run
            it = int(it)
            if it < 0:
                it += iteration
            if not 0 <= it < iteration:
                raise IndexError(
                    f"Sample index {int(it)} out of range for {iteration} "
                    "stored iterations."
                )
            coords = {}
            inds = {}
            for name in g.attrs["branch_names"]:
                c = g["chain"][name][it]
                m = g["inds"][name][it]
                c = np.where(m[..., None], c, 0.0)
                coords[name] = c
                inds[name] = m
            blobs = (
                g["blobs"][it] if g.attrs["has_blobs"] else None
            )
            rs = None
            for attr in ("prng_state_key", "random_state_key"):  # new, legacy
                if attr in g.attrs:
                    rs = np.asarray(g.attrs[attr])
                    break
            return State(
                coords,
                inds=inds,
                log_like=g["log_like"][it],
                log_prior=g["log_prior"][it],
                betas=g["betas"][it],
                blobs=blobs,
                random_state=rs,
            )

    def get_last_sample(self):
        return self.get_a_sample(self.iteration - 1)

    def save_kernel_states(self, kernel_states, move_keys=None):
        """File-persistent variant of ``Backend.save_kernel_states``: flat
        leaves under ``<name>/kernel_states/<move_idx>/<leaf_idx>``,
        rewritten whole each save (the arrays are tiny tuning
        scalars/tables), so tuned proposal state survives a process
        restart — beyond the reference, whose tuning state lives only on
        in-memory move objects.  Object-dtype leaves persist as missing
        indices; ``nleaves`` records the true count so restore keeps
        positions."""
        # fetch off-device BEFORE taking the file handle (batched async)
        per_move = self._kernel_state_host_leaves(kernel_states)
        with self.open("a") as f:
            g = f[self.name]
            if "kernel_states" in g:
                del g["kernel_states"]
            ks_grp = g.create_group("kernel_states")
            if move_keys is not None:
                ks_grp.attrs["move_keys"] = list(move_keys)
            for i, leaves in enumerate(per_move):
                sub = ks_grp.create_group(str(i))
                sub.attrs["nleaves"] = len(leaves)
                for j, arr in enumerate(leaves):
                    if arr is None:  # host objects cannot persist
                        continue
                    sub.create_dataset(str(j), data=arr)

    def save_sampler_clock(self, time):
        """File-persistent tempering clock (see ``Backend.save_sampler_clock``).

        Stored as a group attr; the name avoids the reference's
        ``random_state_*`` attr-collection prefix (``hdfbackend.py:636-644``)
        so reference samplers can still resume our files."""
        with self.open("a") as f:
            f[self.name].attrs["tempering_time"] = int(time)

    def get_sampler_clock(self):
        try:
            with self.open() as f:
                val = f[self.name].attrs.get("tempering_time")
                return None if val is None else int(val)
        except Exception:  # noqa: BLE001 — a checkpoint read must never
            return None  # abort a run; adaptation restarts instead

    def get_kernel_states(self):
        try:
            with self.open() as f:
                g = f[self.name]
                if "kernel_states" not in g:
                    return None
                ks_grp = g["kernel_states"]
                keys = ks_grp.attrs.get("move_keys")
                keys = None if keys is None else [str(k) for k in keys]
                out = []
                for i in sorted(ks_grp, key=int):
                    sub = ks_grp[i]
                    n = int(sub.attrs.get("nleaves", len(sub)))
                    out.append(
                        [
                            sub[str(j)][()] if str(j) in sub else None
                            for j in range(n)
                        ]
                    )
                return keys, out
        except Exception:  # noqa: BLE001 — a checkpoint read must never
            return None  # abort a run; the sampler degrades to fresh tuning


class TempHDFBackend:
    """Context manager creating a temporary HDF5 backend
    (ref ``hdfbackend.py:810-834``)."""

    def __init__(self, dtype=None, compression=None, compression_opts=None):
        self.dtype = dtype
        self.filename = None
        self.compression = compression
        self.compression_opts = compression_opts

    def __enter__(self):
        import tempfile

        f = tempfile.NamedTemporaryFile(
            prefix="eryn-", suffix=".h5", delete=False
        )
        f.close()
        self.filename = f.name
        return HDFBackend(
            f.name,
            "test",
            dtype=self.dtype,
            compression=self.compression,
            compression_opts=self.compression_opts,
        )

    def __exit__(self, exception_type, exception_value, traceback):
        os.remove(self.filename)
