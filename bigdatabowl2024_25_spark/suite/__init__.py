"""Registered parity queries.

Every operator claimed in SURVEY.md §2 is exercised by at least one
query here, registered with @query("name", oracle="<duckdb sql>"). The
driver runs the Spark callable and the oracle SQL side by side at
sf=0.01 and hash-compares results, so:

- every computed column is aliased identically on both sides;
- float aggregations use the decimal-stabilized helpers in `stable.py`
  so reduction order (Spark partitions vs DuckDB's scan order) cannot
  perturb low bits;
- timestamps never appear raw in outputs — they are projected through
  `unix_micros` (Spark) / `epoch_us` (DuckDB), which are timezone- and
  session-independent;
- ties are always broken by a unique key before any limit/top-k.
"""

from .registry import ORACLE, QUERIES, query


def load_all() -> None:
    """Import every suite module so registration side-effects run."""
    from . import asof  # noqa: F401
    from . import range_q  # noqa: F401
    from . import rollup_q  # noqa: F401
    from . import sketch_q  # noqa: F401
    from . import relational  # noqa: F401
    from . import relational2  # noqa: F401
    from . import windows  # noqa: F401
    from . import aggregates  # noqa: F401
    from . import scalars  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import skew  # noqa: F401
    from . import text  # noqa: F401
    from . import bdb  # noqa: F401
    from . import streaming_q  # noqa: F401
    from . import multimodal_q  # noqa: F401
    from . import sources_q  # noqa: F401


__all__ = ["QUERIES", "ORACLE", "query", "load_all"]
