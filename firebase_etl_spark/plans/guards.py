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
    return out


def assert_scale_safe(df: DataFrame) -> None:
    """Raise AssertionError when the plan contains a scale anti-pattern."""
    violations = scale_violations(df)
    if violations:
        raise AssertionError(
            "scale-unsafe plan: " + "; ".join(sorted(set(violations)))
        )
