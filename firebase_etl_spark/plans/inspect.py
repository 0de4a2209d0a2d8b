"""Physical-plan inspection helpers — the engine's "is this the plan I
wanted" surface. Used by tests to pin optimizer behavior (pushdown,
broadcast, window-limit) so a regression that silently de-optimizes a
query fails CI instead of shipping a 100×-slower plan to the cluster.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if some scan's PushedFilters mentions ``fragment``."""
    plan = physical_plan(df)
    return any(
        fragment in line for line in plan.splitlines() if "PushedFilters" in line
    )


def scans_read_columns(df: DataFrame) -> list[str]:
    """ReadSchema lines — verify column pruning reached the scan."""
    return [
        line.strip()
        for line in physical_plan(df).splitlines()
        if "ReadSchema" in line
    ]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_window_group_limit(df: DataFrame) -> bool:
    """Spark's rank-limit pushdown: per-partition top-k before the shuffle."""
    return "WindowGroupLimit" in physical_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles) in the plan."""
    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line and "(" in line
        and line.strip().startswith(("+-", ":-", "Exchange"))
    )
