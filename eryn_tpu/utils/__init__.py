"""Utilities (re-design of ``/root/reference/src/eryn/utils/``)."""

from .periodic import PeriodicContainer
from .utility import (
    get_acf,
    get_integrated_act,
    groups_from_inds,
    psrf,
    effective_sample_size,
    rank_normalized_rhat,
    stepping_stone_log_evidence,
    thermodynamic_integration_log_evidence,
)

from scipy.special import logsumexp  # noqa: F401  (re-exported like the ref)

from .profiling import SegmentTimer, trace_profile

__all__ = [
    "PeriodicContainer",
    "SegmentTimer",
    "trace_profile",
    "logsumexp",
    "groups_from_inds",
    "get_acf",
    "get_integrated_act",
    "thermodynamic_integration_log_evidence",
    "stepping_stone_log_evidence",
    "psrf",
    "effective_sample_size",
    "rank_normalized_rhat",
]

try:  # pragma: no cover - staged build
    from .transform import TransformContainer

    __all__ += ["TransformContainer"]
except ImportError:  # pragma: no cover
    pass

try:  # pragma: no cover - staged build
    from .stopping import AutoCorrelationStop, SearchConvergeStopping, Stopping

    __all__ += ["Stopping", "SearchConvergeStopping", "AutoCorrelationStop"]
except ImportError:  # pragma: no cover
    pass

try:  # pragma: no cover - staged build
    from .updates import Update, CompositeUpdate, UpdateStep, AdjustStretchProposalScale

    __all__ += ["Update", "CompositeUpdate", "UpdateStep", "AdjustStretchProposalScale"]
except ImportError:  # pragma: no cover
    pass

try:  # pragma: no cover - staged build
    from .plot import PlotContainer

    __all__ += ["PlotContainer"]
except ImportError:  # pragma: no cover
    pass
