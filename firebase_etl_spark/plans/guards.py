"""Scale-safety plan guards — a lint for the physical-plan anti-patterns
that melt down at 100 TB even though they pass every small-SF test:

- ``CartesianProductExec``: an un-broadcast cross join; O(n*m) rows.
- ``WindowExec``/``WindowGroupLimitExec`` with an EMPTY partition spec: a
  global-order window executes on ONE partition — the classic silent
  scale killer (ntile/rank/cumsum over the whole table).

``assert_scale_safe(df)`` walks the compiled physical plan via the JVM
tree (not string matching) and raises with the offending node. The test
suite sweeps every driver query through it, so a new query that sneaks
in a global window or a cartesian join fails CI instead of shipping.

Deliberately NOT flagged: BroadcastNestedLoopJoin (the plan a broadcast
cross join of a tiny stats/cuts row compiles to — intentional in several
queries) and global sorts (a final orderBy on an aggregate's handful of
output rows is fine; truly large sorted outputs are a sink decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _iter_nodes(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _iter_nodes(children.apply(i))
    # wrapped subtrees (WholeStageCodegen / InputAdapter) are covered by
    # children(); AdaptiveSparkPlan hides its current plan behind a method
    for attr in ("initialPlan", "executedPlan"):
        if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            try:
                yield from _iter_nodes(getattr(node, attr)())
            except Exception:
                pass


#: Known low-cardinality columns (fixture dictionary): single-digit
#: codomains in the TPC-H-ish tables, plus the generic group alias the
#: grouped stats operators project their group column to. A window
#: partitioned ONLY by these runs each group's whole slice on ONE task
#: — a constant-k parallelism cap the empty-PARTITION-BY check cannot
#: see (the r10 Jonckheere bug class, VERDICT r10 #3). Two-phase forms
#: partition by (group, __pid) and never trip this: __pid is not low-k.
LOW_K_COLUMNS = frozenset(
    {
        "o_orderpriority",
        "o_orderstatus",
        "l_returnflag",
        "l_linestatus",
        "l_shipmode",
        "l_shipinstruct",
        "c_mktsegment",
        "r_name",
        "lang",
        "event_type",
        "g",
        "group_key",
    }
)

_ATTR_RE = None


def _partition_attr_names(node) -> set[str]:
    """Attribute names referenced by a window node's partitionSpec,
    parsed from the JVM expression strings (``col_name#exprId``)."""
    global _ATTR_RE
    if _ATTR_RE is None:
        import re

        _ATTR_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")
    spec = node.partitionSpec()
    names: set[str] = set()
    for i in range(spec.size()):
        names.update(_ATTR_RE.findall(spec.apply(i).toString()))
    return names


def scale_violations(df: DataFrame) -> list[str]:
    """List of human-readable violations in the df's physical plan."""
    plan = df._jdf.queryExecution().executedPlan()
    out = []
    for node in _iter_nodes(plan):
        name = node.getClass().getSimpleName()
        if name == "CartesianProductExec":
            out.append("CartesianProduct: un-broadcast cross join")
        elif name in ("WindowExec", "WindowGroupLimitExec"):
            if node.partitionSpec().isEmpty():
                out.append(
                    f"{name} with empty PARTITION BY: global-order window "
                    "runs on a single partition"
                )
            else:
                attrs = _partition_attr_names(node)
                if attrs and attrs <= LOW_K_COLUMNS:
                    out.append(
                        f"{name} low-k PARTITION BY ({', '.join(sorted(attrs))}): "
                        "constant-cardinality partition spec caps the window "
                        "at ~k tasks at any data size — use the two-phase "
                        "grouped rank/prefix helpers, or allowlist if the "
                        "input is provably bounded (not data-sized)"
                    )
    return out


def assert_scale_safe(df: DataFrame, allow_low_k: bool = False) -> None:
    """Raise AssertionError when the plan contains a scale anti-pattern.

    ``allow_low_k=True`` tolerates the low-cardinality-PARTITION-BY
    class only — for triaged queries whose low-k window provably runs
    over a BOUNDED input (e.g. a <= 3*k*#tasks candidate set or a
    k*#partitions segment table); the hard violations (cartesian,
    empty PARTITION BY) still raise."""
    violations = scale_violations(df)
    if allow_low_k:
        violations = [v for v in violations if "low-k PARTITION BY" not in v]
    if violations:
        raise AssertionError(
            "scale-unsafe plan: " + "; ".join(sorted(set(violations)))
        )
