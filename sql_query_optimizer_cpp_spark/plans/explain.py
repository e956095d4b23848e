"""Reference-style EXPLAIN: an indented operator tree with row estimates.

The reference renders ``-> Operator (detail) [rows=N, cost=C]`` trees
(``engine/include/execution_plan.h:247-261``, sample output
``OPTIMIZATION_DEMO.md:209-233``) — though its CLI actually prints
hand-formatted fake lines (``engine/src/cli.cpp:267-298``).  We render the
*real* Catalyst optimized plan with per-node statistics, which is the
honest version of the same surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _to_int(v) -> int:
    """py4j converts scala.math.BigInt to Python int in most paths; fall
    back to toString for the cases it doesn't."""
    return v if isinstance(v, int) else int(v.toString())


@dataclass
class PlanNode:
    name: str
    detail: str
    row_count: int | None
    size_bytes: int | None
    children: list["PlanNode"] = field(default_factory=list)

    def render(self, indent: int = 0) -> str:
        stats = []
        if self.row_count is not None:
            stats.append(f"rows={self.row_count}")
        if self.size_bytes is not None:
            stats.append(f"size={self.size_bytes}B")
        suffix = f"  [{', '.join(stats)}]" if stats else ""
        detail = f" ({self.detail})" if self.detail else ""
        lines = ["  " * indent + f"-> {self.name}{detail}{suffix}"]
        for c in self.children:
            lines.append(c.render(indent + 1))
        return "\n".join(lines)


def _walk(jnode, spark) -> PlanNode:
    name = jnode.nodeName()
    try:
        detail = jnode.argString(80)
    except Exception:
        detail = ""
    row_count = None
    size_bytes = None
    try:
        stats = jnode.stats()
        size_bytes = _to_int(stats.sizeInBytes())
        rc = stats.rowCount()
        if rc.isDefined():
            row_count = _to_int(rc.get())
    except Exception:
        pass
    children = []
    it = jnode.children().iterator()
    while it.hasNext():
        children.append(_walk(it.next(), spark))
    return PlanNode(name, detail, row_count, size_bytes, children)


def explain_tree(df) -> str:
    """Render the optimized logical plan as a reference-style tree with
    Catalyst statistics per node."""
    qe = df._jdf.queryExecution()
    root = _walk(qe.optimizedPlan(), df.sparkSession)
    return "ExecutionPlan:\n" + root.render(1)


def explain_full(df) -> str:
    """The three Catalyst stages, reference CLI-style sectioning."""
    qe = df._jdf.queryExecution()
    return (
        "=== Analyzed Logical Plan ===\n"
        + qe.analyzed().toString()
        + "\n=== Optimized Logical Plan (with stats) ===\n"
        + explain_tree(df)
        + "\n\n=== Physical Plan ===\n"
        + qe.executedPlan().toString()
    )
