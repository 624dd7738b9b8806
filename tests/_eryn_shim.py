"""Shared ``eryn`` -> ``eryn_tpu`` module shim for the reference runners.

``reference_shim_runner.py`` (the reference's own unittest suite) and
``reference_example_runner.py`` (the reference's example scripts) both need
the reference package name to resolve to this package in a SUBPROCESS —
the shim must never leak into the pytest process, where the parity tests
import the live reference ``eryn``.  Keeping the alias table in one place
means a new submodule alias lands in both runners at once.
"""

import sys


def install_eryn_shim():
    """Force CPU + the persistent jit cache, then alias ``eryn`` (and every
    submodule the reference's tests/examples import) to ``eryn_tpu`` in
    ``sys.modules``."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    sys.path.insert(0, "/root/repo")

    import eryn_tpu
    import eryn_tpu.backends
    import eryn_tpu.ensemble
    import eryn_tpu.model
    import eryn_tpu.moves
    import eryn_tpu.pbar
    import eryn_tpu.prior
    import eryn_tpu.state
    import eryn_tpu.utils
    import eryn_tpu.utils.utility

    aliases = {
        "eryn": eryn_tpu,
        "eryn.ensemble": eryn_tpu.ensemble,
        "eryn.state": eryn_tpu.state,
        "eryn.prior": eryn_tpu.prior,
        "eryn.moves": eryn_tpu.moves,
        "eryn.backends": eryn_tpu.backends,
        "eryn.utils": eryn_tpu.utils,
        "eryn.utils.utility": eryn_tpu.utils.utility,
        "eryn.model": eryn_tpu.model,
        "eryn.pbar": eryn_tpu.pbar,
    }
    for name, mod in aliases.items():
        sys.modules[name] = mod
    return aliases
