"""Module-level NumPy likelihood for the real-``multiprocessing.Pool`` test.

Lives in its own module so spawn-context pool workers can unpickle the
sampler's ``_CallbackWorker`` (which pickles the function by module path)
without importing the full test module.  Records each worker's pid to the
file named by ``ERYN_TPU_POOL_PID_FILE`` so the test can prove the work
actually crossed a process boundary.
"""

import os

import numpy as np


def pool_log_like(x):
    pid_file = os.environ.get("ERYN_TPU_POOL_PID_FILE")
    if pid_file:
        with open(pid_file, "a") as fh:
            fh.write(f"{os.getpid()}\n")
    return -0.5 * float(np.sum(np.asarray(x, dtype=float) ** 2))
