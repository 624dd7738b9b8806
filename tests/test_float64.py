"""Double-precision mode: the sampler runs end-to-end under
``jax_enable_x64`` with ``dtype=np.float64`` (subprocess-isolated — x64 is
global jax config and must not leak into the f32 suite)."""

import subprocess
import sys

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from eryn_tpu import EnsembleSampler
from eryn_tpu.backends import HDFBackend
from eryn_tpu.prior import ProbDistContainer, uniform_dist
from eryn_tpu.moves import ChEESHMCMove, SliceMove
import tempfile, os

pr = ProbDistContainer({i: uniform_dist(-5, 5) for i in range(3)})
def ll(x):
    return -0.5 * jnp.sum(x**2)

# tempered DEO + the new move families, all at f64
for moves in (None, [SliceMove(tune_steps=20)], [ChEESHMCMove(tune_steps=20)]):
    ens = EnsembleSampler(16, 3, ll, pr, dtype=np.float64,
                          tempering_kwargs=dict(ntemps=3, swap_scheme="deo"),
                          moves=moves, seed=1)
    ens.run_mcmc(pr.rvs(size=(3, 16)), 60)
    ch = ens.get_chain()["model_0"]
    assert ch.dtype == np.float64, ch.dtype
    assert np.isfinite(ens.get_log_like()).all()

# f64 HDF round trip incl. kernel-state checkpoint
fn = tempfile.mktemp(suffix=".h5")
ens = EnsembleSampler(16, 3, ll, pr, dtype=np.float64,
                      backend=HDFBackend(fn, dtype=np.float64),
                      moves=[SliceMove(tune_steps=15)], seed=2)
ens.run_mcmc(pr.rvs(size=(1, 16)), 40)
mu = float(np.asarray(ens._kernel_states[0]["mu"]))
del ens
ens2 = EnsembleSampler(16, 3, ll, pr, dtype=np.float64,
                       backend=HDFBackend(fn, dtype=np.float64),
                       moves=[SliceMove(tune_steps=15)], seed=3)
ens2.run_mcmc(None, 10)
assert float(np.asarray(ens2._kernel_states[0]["mu"])) == mu
assert ens2.get_chain()["model_0"].dtype == np.float64
os.remove(fn)
print("F64-OK")
"""


def test_float64_mode_end_to_end():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0 and "F64-OK" in proc.stdout, (
        proc.stdout[-2000:],
        proc.stderr[-3000:],
    )
