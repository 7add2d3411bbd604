"""Named query registry: every implemented operator from SURVEY.md §2
is demonstrated by at least one registered query over the driver
testdata tables, with an ANSI-SQL twin for the DuckDB oracle whenever
the semantics are SQL-expressible.
"""

from .registry import QuerySpec, all_queries, get, ordered_queries, register

# Importing the modules populates the registry.
from . import relational  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import advanced_agg  # noqa: E402,F401
from . import cleaning  # noqa: E402,F401
from . import semistructured  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import mlstream  # noqa: E402,F401
from . import scale  # noqa: E402,F401
from . import temporal  # noqa: E402,F401
from . import tpch_classic  # noqa: E402,F401
from . import tpch_fill  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import dimensions  # noqa: E402,F401
from . import basetable  # noqa: E402,F401
from . import retrieval  # noqa: E402,F401
from . import selection  # noqa: E402,F401
from . import diagnostics  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import markov  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import governance  # noqa: E402,F401
from . import graph  # noqa: E402,F401
from . import transactional  # noqa: E402,F401

__all__ = ["QuerySpec", "all_queries", "get", "ordered_queries", "register"]
