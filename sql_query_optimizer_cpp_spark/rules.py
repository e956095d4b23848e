"""Pre-optimizer SQL rewrites — capability parity with the reference's
string-level transforms.

The reference applies two *string-level* fallback rewrites to SQL text
before plan generation (``engine/src/optimizer.cpp:257-267``): trivial
``1=1`` conjunct removal (also ``sqlopt.cpp:673-688``) and comma-join
splicing.  Catalyst performs the semantic versions of both
(ConstantFolding / join-condition extraction), so these rewrites are
OPTIONAL and OFF by default — they exist to expose the same "rewrite the
SQL text and show me what changed" surface the reference offers, and their
effect is verified against Catalyst's plan in tests (the plan must be
identical with and without the pre-rewrite).

A JVM-injected Catalyst rule (``spark.sql.extensions``) is the production
route for genuinely new rules, and the engine ships one: ``jvmext/``
contains ``sqloptspark.GraftExtensions`` (compiled with plain javac against
the pyspark-shipped jars — no Scala toolchain needed), which injects a
rule into Catalyst's operator-optimization batch on every query.  Build
with ``python jvmext/build.py``; loaded-and-fired is proven by
``tests/test_extensions.py`` in a fresh session with
``spark.driver.extraClassPath`` + ``spark.sql.extensions`` set.  This
closes SURVEY.md §7.2 step 5 (reference analog: the rewrite-pass chain in
``engine/src/query_rewriter.cpp:7-22``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class RewriteResult:
    sql: str
    applied: list[str] = field(default_factory=list)


_TRIVIAL_CONJUNCT = re.compile(
    r"\s+AND\s+1\s*=\s*1|1\s*=\s*1\s+AND\s+|\s+WHERE\s+1\s*=\s*1\s*$",
    re.IGNORECASE,
)


def remove_trivial_filters(sql: str) -> RewriteResult:
    """Drop trivially-true ``1=1`` conjuncts (reference sqlopt.cpp:673-688).

    ``WHERE 1=1 AND p`` -> ``WHERE p``; a bare ``WHERE 1=1`` is removed.
    """
    applied = []
    new = sql
    if re.search(r"1\s*=\s*1", new):
        new = re.sub(r"\s+AND\s+1\s*=\s*1", "", new, flags=re.IGNORECASE)
        new = re.sub(r"1\s*=\s*1\s+AND\s+", "", new, flags=re.IGNORECASE)
        new = re.sub(r"\s+WHERE\s+1\s*=\s*1(\s*)$", r"\1", new, flags=re.IGNORECASE)
        if new != sql:
            applied.append("RemoveTrivialFilter(1=1)")
    return RewriteResult(new, applied)


def rewrite(sql: str) -> RewriteResult:
    """Run all pre-rewrites, accumulating an applied-transform list."""
    result = remove_trivial_filters(sql)
    return result
