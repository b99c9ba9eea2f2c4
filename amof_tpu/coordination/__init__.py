from amof_tpu.coordination.core import (
    CoordinationSearch,
    NotImplementedSearch,
    SearchError,
)
from amof_tpu.coordination.reduce import reduce_trajectory

__all__ = [
    "CoordinationSearch",
    "NotImplementedSearch",
    "SearchError",
    "reduce_trajectory",
]
