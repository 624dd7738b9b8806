"""Run the reference's own example scripts against eryn_tpu.

Same module shim as ``reference_shim_runner.py`` (``eryn`` -> ``eryn_tpu``),
plus the minimal headless-CI environment stubs the scripts assume
interactively:

- ``matplotlib`` forced to Agg with ``plt.show`` a no-op and ``usetex``
  disabled (no LaTeX in the container; the scripts only *display* figures),
- ``chainconsumer`` / ``corner`` stubbed (imported by the examples but not
  exercised on the executed code path; neither is installed here).

The example SOURCE is executed unmodified from ``/root/reference/examples``.
Notably ``two_models_swap_test.py`` imports ``BasicSymmetricModelSwapRJMove``,
which does not exist in the reference package (stale roadmap import — the
script CRASHES under the reference itself); eryn_tpu implements it
(``moves/modelswap.py``), so the reference's own example runs only here.

Usage: ``python reference_example_runner.py <example_filename.py>``
Exit code 0 iff the script ran to completion.
"""

import os
import runpy
import sys
import tempfile
import types

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, "/root/repo")

import eryn_tpu  # noqa: E402
import eryn_tpu.backends  # noqa: E402
import eryn_tpu.ensemble  # noqa: E402
import eryn_tpu.moves  # noqa: E402
import eryn_tpu.prior  # noqa: E402
import eryn_tpu.state  # noqa: E402
import eryn_tpu.utils  # noqa: E402
import eryn_tpu.utils.utility  # noqa: E402

ALIASES = {
    "eryn": eryn_tpu,
    "eryn.ensemble": eryn_tpu.ensemble,
    "eryn.state": eryn_tpu.state,
    "eryn.prior": eryn_tpu.prior,
    "eryn.moves": eryn_tpu.moves,
    "eryn.backends": eryn_tpu.backends,
    "eryn.utils": eryn_tpu.utils,
    "eryn.utils.utility": eryn_tpu.utils.utility,
    "eryn.model": __import__("eryn_tpu.model", fromlist=["Model"]),
    "eryn.pbar": __import__("eryn_tpu.pbar", fromlist=["get_progress_bar"]),
}
for name, mod in ALIASES.items():
    sys.modules[name] = mod

# headless stubs: imported at example module scope, never exercised
corner_stub = types.ModuleType("corner")
corner_stub.corner = lambda *a, **k: None
sys.modules.setdefault("corner", corner_stub)

cc_stub = types.ModuleType("chainconsumer")


class _ChainConsumer:  # pragma: no cover - import-compat only
    def __getattr__(self, name):
        raise RuntimeError(
            "chainconsumer is stubbed in the example runner; the executed "
            "examples import it but do not call it"
        )


cc_stub.ChainConsumer = _ChainConsumer
sys.modules.setdefault("chainconsumer", cc_stub)

import matplotlib  # noqa: E402

matplotlib.use("Agg", force=True)

# the examples set text.usetex=True for pretty interactive figures; no LaTeX
# toolchain exists in this container, so pin it off whatever the script sets
_orig_update = matplotlib.rcParams.update


def _update_no_usetex(*args, **kwargs):
    _orig_update(*args, **kwargs)
    matplotlib.rcParams["text.usetex"] = False


matplotlib.rcParams.update = _update_no_usetex

import matplotlib.pyplot as plt  # noqa: E402

plt.show = lambda *a, **k: plt.close("all")


def main(argv):
    import warnings

    warnings.simplefilter("ignore")

    example = os.path.join("/root/reference/examples", argv[0])
    if not os.path.exists(example):
        raise FileNotFoundError(example)

    # examples write plot folders/HDF5 files relative to cwd
    with tempfile.TemporaryDirectory() as tmp:
        os.chdir(tmp)
        runpy.run_path(example, run_name="__main__")
    print(f"example {argv[0]} ran to completion under eryn_tpu")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
