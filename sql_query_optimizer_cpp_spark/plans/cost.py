"""4-component cost report in the reference's style, fed by Catalyst stats.

The reference models cost as ``CostComponents{io, cpu, memory, network}``
with constants SEQ_PAGE_COST=1.0, RAND_PAGE_COST=4.0, CPU_TUPLE_COST=0.01,
INDEX_LOOKUP_COST=2.0, SORT_COST_PER_TUPLE=0.1 and pages ~= rows/100
(``engine/include/cost_estimator.h:7-33``, per-operator formulas
``engine/src/cost_estimator.cpp:7-136``, page estimate
``engine/src/statistics_manager.cpp:46``).

Catalyst has its own (better) cost model; this module *presents* per-node
costs with the reference's formulas and constants so a reference user gets
the familiar report — it never influences planning (SURVEY.md §4.2:
presentation-only).  Network cost is populated for exchange nodes, which
the reference declared "for distributed" but never assigned.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# reference constants, engine/include/cost_estimator.h:29-33
SEQ_PAGE_COST = 1.0
RAND_PAGE_COST = 4.0
CPU_TUPLE_COST = 0.01
INDEX_LOOKUP_COST = 2.0
SORT_COST_PER_TUPLE = 0.1
ROWS_PER_PAGE = 100  # statistics_manager.cpp:46


def _to_int(v) -> int:
    """py4j converts scala.math.BigInt to Python int in most paths; fall
    back to toString for the cases it doesn't."""
    return v if isinstance(v, int) else int(v.toString())


@dataclass
class CostComponents:
    io: float = 0.0
    cpu: float = 0.0
    memory: float = 0.0
    network: float = 0.0

    @property
    def total(self) -> float:
        return self.io + self.cpu + self.memory + self.network


@dataclass
class NodeCost:
    operator: str
    rows: int
    cost: CostComponents


@dataclass
class CostReport:
    nodes: list[NodeCost] = field(default_factory=list)

    @property
    def total(self) -> CostComponents:
        agg = CostComponents()
        for n in self.nodes:
            agg.io += n.cost.io
            agg.cpu += n.cost.cpu
            agg.memory += n.cost.memory
            agg.network += n.cost.network
        return agg

    def render(self) -> str:
        lines = [
            f"{'operator':<28} {'rows':>12} {'io':>12} {'cpu':>12} "
            f"{'memory':>12} {'network':>12} {'total':>12}"
        ]
        for n in self.nodes:
            c = n.cost
            lines.append(
                f"{n.operator:<28} {n.rows:>12} {c.io:>12.2f} {c.cpu:>12.2f} "
                f"{c.memory:>12.2f} {c.network:>12.2f} {c.total:>12.2f}"
            )
        t = self.total
        lines.append(
            f"{'TOTAL':<28} {'':>12} {t.io:>12.2f} {t.cpu:>12.2f} "
            f"{t.memory:>12.2f} {t.network:>12.2f} {t.total:>12.2f}"
        )
        return "\n".join(lines)


def _node_cost(name: str, rows: int, child_rows: list[int]) -> CostComponents:
    """Apply the reference's per-operator formulas to Catalyst row counts."""
    pages = max(rows // ROWS_PER_PAGE, 1)
    c = CostComponents()
    lname = name.lower()
    if "relation" in lname or "scan" in lname:
        # table scan: engine/src/cost_estimator.cpp:7-24
        c.io = pages * SEQ_PAGE_COST
        c.cpu = rows * CPU_TUPLE_COST
    elif "join" in lname:
        # hash-join formula: engine/src/cost_estimator.cpp:57-61
        l = child_rows[0] if child_rows else rows
        r = child_rows[1] if len(child_rows) > 1 else rows
        c.cpu = (l + r) * CPU_TUPLE_COST * 2
        c.memory = 0.1 * max(l, r)
    elif "sort" in lname:
        # external sort: engine/src/cost_estimator.cpp:71-83
        c.cpu = rows * SORT_COST_PER_TUPLE
        c.io = pages * SEQ_PAGE_COST
    elif "aggregate" in lname:
        # aggregation: engine/src/cost_estimator.cpp:85-95
        inp = child_rows[0] if child_rows else rows
        c.cpu = inp * CPU_TUPLE_COST
        c.memory = 0.1 * rows
    elif "exchange" in lname or "shuffle" in lname:
        # the component the reference declared but never used — real here
        c.network = rows * CPU_TUPLE_COST
    elif "filter" in lname:
        inp = child_rows[0] if child_rows else rows
        c.cpu = inp * CPU_TUPLE_COST
    else:
        c.cpu = rows * CPU_TUPLE_COST
    return c


def _walk(jnode, out: list[NodeCost]) -> int:
    """Post-order walk returning this node's row estimate."""
    children = []
    it = jnode.children().iterator()
    while it.hasNext():
        children.append(_walk(it.next(), out))
    rows = 0
    try:
        stats = jnode.stats()
        rc = stats.rowCount()
        if rc.isDefined():
            rows = _to_int(rc.get())
        else:
            # fall back: size / 100 bytes per row, floor 1
            rows = max(_to_int(stats.sizeInBytes()) // 100, 1)
    except Exception:
        rows = children[0] if children else 1
    out.append(NodeCost(jnode.nodeName(), rows, _node_cost(jnode.nodeName(), rows, children)))
    return rows


def cost_report(df) -> CostReport:
    """Reference-style 4-component cost report over the optimized plan."""
    report = CostReport()
    _walk(df._jdf.queryExecution().optimizedPlan(), report.nodes)
    report.nodes.reverse()  # root first, like the reference's explain
    return report
