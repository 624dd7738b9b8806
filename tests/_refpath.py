"""Location of the reference Eryn checkout.

Defaults to the read-only container mount; CI's reference-compat job clones
mikekatz04/Eryn and points ``ERYN_REFERENCE_PATH`` at it so the live-reference
lanes (parity, shim suite, examples) run on GitHub runners too.
"""

import os

REFERENCE_PATH = os.environ.get("ERYN_REFERENCE_PATH", "/root/reference")
REFERENCE_SRC = os.path.join(REFERENCE_PATH, "src")
REFERENCE_TESTS = os.path.join(REFERENCE_PATH, "tests")
REFERENCE_EXAMPLES = os.path.join(REFERENCE_PATH, "examples")


def reference_available():
    return os.path.isdir(REFERENCE_SRC)
