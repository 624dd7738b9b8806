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
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _eryn_shim import install_eryn_shim  # noqa: E402

install_eryn_shim()

# the reference tests `import corner` at module scope but never call it
sys.modules.setdefault("corner", types.ModuleType("corner"))


def _install_scale_wrapper():
    """Optionally scale every ``run_mcmc(nsteps, burn=...)`` the reference
    test drives (``ERYN_TPU_REFERENCE_SCALE=0.1`` -> 10x fewer steps, floor
    20).  The unmodified reference test code still runs verbatim — only the
    chain lengths shrink — which keeps a scaled variant of the slow cases in
    the default CI lane."""
    scale = float(os.environ.get("ERYN_TPU_REFERENCE_SCALE", "1") or 1)
    if scale >= 1:
        return
    import eryn.ensemble as _ens

    orig = _ens.EnsembleSampler.run_mcmc

    def run_mcmc(self, initial_state, nsteps, *args, burn=None, **kwargs):
        nsteps = max(20, int(round(nsteps * scale)))
        if burn is not None and burn:
            burn = max(20, int(round(burn * scale)))
        return orig(self, initial_state, nsteps, *args, burn=burn, **kwargs)

    _ens.EnsembleSampler.run_mcmc = run_mcmc


def main(argv):
    import unittest
    import warnings

    warnings.simplefilter("ignore")

    from _refpath import REFERENCE_TESTS

    _install_scale_wrapper()

    spec = importlib.util.spec_from_file_location(
        "reference_test_eryn", os.path.join(REFERENCE_TESTS, "test_eryn.py")
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
