"""Run the reference's own test suite against eryn_tpu.

Installs ``eryn_tpu`` as the ``eryn`` package in ``sys.modules``, loads
``/root/reference/tests/test_eryn.py`` unmodified, and executes the
requested unittest methods.  Invoked in a SUBPROCESS by
``tests/test_reference_suite.py`` — the module shim must not leak into the
pytest process, where the parity tests import the real reference ``eryn``.

Usage: ``python reference_shim_runner.py test_base [test_pt ...]``
Exit code 0 iff every requested test passed.
"""

import importlib.util
import sys
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

# the reference tests `import corner` at module scope but never call it
sys.modules.setdefault("corner", types.ModuleType("corner"))

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


def main(argv):
    import unittest
    import warnings

    warnings.simplefilter("ignore")

    spec = importlib.util.spec_from_file_location(
        "reference_test_eryn", "/root/reference/tests/test_eryn.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    suite = unittest.TestSuite(
        mod.ErynTest(name) for name in argv
    )
    runner = unittest.TextTestRunner(verbosity=2)
    result = runner.run(suite)
    return 0 if result.wasSuccessful() else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
