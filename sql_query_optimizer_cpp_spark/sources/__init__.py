"""Sources & sinks.

Reference surface mapped (SURVEY.md §2.1):

- S3 MySQL source connector -> :func:`read` (parquet/csv/json/orc) and
  :func:`read_jdbc` (the literal parity path, gated on a JDBC driver jar
  being present);
- S5 result sink (stdout) -> ``df.show()`` / :func:`write`;
- S6 INSERT sink (parse-only in the reference) -> real INSERT via
  ``spark.sql`` on managed tables, or :func:`write` append mode.

Everything returns lazy DataFrames; writers expose the two layout knobs
that matter at 100 TB: ``partition_by`` (directory partition pruning) and
``bucket_by`` (co-located joins without a shuffle).
"""

from .readers import read, read_jdbc
from .writers import write, write_jdbc

__all__ = ["read", "read_jdbc", "write", "write_jdbc"]
