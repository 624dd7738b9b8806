"""Progress bar wrapper (re-design of ``/root/reference/src/eryn/pbar.py:15-56``)."""

from __future__ import annotations

import logging

__all__ = ["get_progress_bar"]

logger = logging.getLogger(__name__)

try:
    import tqdm
except ImportError:
    tqdm = None


class _NoOpPBar:
    """No-op progress bar fallback."""

    def __enter__(self):
        return self

    def __exit__(self, *args):
        pass

    def update(self, count):
        pass


def get_progress_bar(display, total):
    """Return a tqdm progress bar or a no-op stand-in.

    Args:
        display: ``False``/``None`` for no bar, ``True`` for ``tqdm``, or a
            string naming a tqdm submodule (e.g. ``"notebook"``).
        total: total number of expected updates.
    """
    if not display:
        return _NoOpPBar()
    if tqdm is None:
        logger.warning(
            "You must install the tqdm library to use progress indicators."
        )
        return _NoOpPBar()
    if display is True:
        return tqdm.tqdm(total=total)
    return getattr(tqdm, f"tqdm_{display}")(total=total)
