"""Chain storage backends (re-design of ``/root/reference/src/eryn/backends/``)."""

from .backend import Backend
from .devicebackend import DeviceBackend

try:  # pragma: no cover - staged build
    from .hdfbackend import HDFBackend, TempHDFBackend

    __all__ = ["Backend", "DeviceBackend", "HDFBackend", "TempHDFBackend"]
except ImportError:  # pragma: no cover
    class HDFBackend:  # type: ignore
        def __init__(self, *args, **kwargs):
            raise NotImplementedError("HDFBackend requires h5py.")

    __all__ = ["Backend", "DeviceBackend", "HDFBackend"]


def get_test_backends():
    """Backends usable for testing (ref ``backends/__init__.py:10-20``):
    the in-memory backend plus, when h5py is available, the temp-file HDF
    backend context manager."""
    backends = [Backend]
    # guard on the name actually bound at import time: h5py may import fine
    # while hdfbackend's own import chain failed
    if "TempHDFBackend" in globals():
        backends.append(TempHDFBackend)
    return backends
