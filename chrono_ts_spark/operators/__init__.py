"""Signature operators Spark lacks as built-ins, expressed as
logical-plan patterns (SURVEY.md §4: zero custom Catalyst rules).

Each function takes and returns DataFrames, composes with everything
else, and is designed around shuffle behavior at scale: one shuffle on
the series key (or none when the input is already partitioned that
way), no driver-side collection, no row-at-a-time Python.
"""

from .asof import asof_join
from .gapfill import gapfill
from .rangejoin import range_join
from .rate import rate
from .sessionize import sessionize
from .topk import top_k_per_group

__all__ = [
    "asof_join",
    "gapfill",
    "range_join",
    "rate",
    "sessionize",
    "top_k_per_group",
]
