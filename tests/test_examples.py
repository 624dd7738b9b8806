"""Smoke-run every script in ``examples/`` end-to-end.

Each example is a user-facing demonstration of the public API; a broken
example is a broken front door.  ``ERYN_TPU_EXAMPLE_SCALE`` shrinks the
step counts so the whole sweep stays CI-sized (the statistical
assertions inside the examples only run at full scale where they are
meaningful — shrunk runs just have to complete without error).
"""

import glob
import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)
EXAMPLES = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(EXAMPLES_DIR, "*.py"))
)

# measured (warm jit cache, single vCPU) smoke runtimes are 10-60 s each
SCALE = "0.05"


def test_examples_discovered():
    assert len(EXAMPLES) >= 6, EXAMPLES


# env vars are too late to pick the platform (sitecustomize pre-imports
# jax with the accelerator backend), so the driver forces CPU + the
# persistent jit cache via jax.config before executing the script
_DRIVER = """
import runpy, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
runpy.run_path(sys.argv[1], run_name="__main__")
"""


@pytest.mark.parametrize("example", EXAMPLES)
def test_example_runs(example, tmp_path):
    env = dict(os.environ)
    env["ERYN_TPU_EXAMPLE_SCALE"] = SCALE
    env["MPLBACKEND"] = "Agg"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            _DRIVER,
            os.path.join(EXAMPLES_DIR, example),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=tmp_path,  # examples may write plot files relative to cwd
        env=env,
    )
    assert proc.returncode == 0, (
        f"{example} failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
