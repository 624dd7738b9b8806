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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _eryn_shim import install_eryn_shim  # noqa: E402

install_eryn_shim()

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

    from _refpath import REFERENCE_EXAMPLES

    example = os.path.join(REFERENCE_EXAMPLES, argv[0])
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
