"""sql_query_optimizer_cpp_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``Atharva14518/sql_query_optimizer_cpp`` (an educational SQL
SELECT optimizer front-end; see SURVEY.md), re-expressed Spark-first:

- the reference's optimizer rewrites (comma-join conversion, scalar-subquery
  -> LEFT JOIN, predicate pushdown, projection pruning, constant folding,
  cost-based join ordering) are delegated to Catalyst, which implements all
  of them natively (SURVEY.md §4.1);
- the reference's *capability surface* (sql -> optimize -> explain -> trace
  -> execute -> stats) is exposed through :class:`Engine` in
  :mod:`.engine`;
- large-scale training-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal columns, event-time windows) live under
  :mod:`.operators` and :mod:`.streaming`.

Everything is DataFrame/SQL-declarative so Catalyst + Tungsten + AQE pick
the physical strategy; Python touches data only through Arrow-batched
Pandas UDFs where built-ins genuinely cannot express the semantics.
"""

from .session import get_session
from .catalog import TABLES, register_views, load_tables

__all__ = [
    "get_session",
    "TABLES",
    "register_views",
    "load_tables",
]

__version__ = "0.1.0"
