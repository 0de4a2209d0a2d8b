"""round(double) exposure audit (VERDICT r6 #3).

Spark's ``F.round`` rounds HALF_UP on the exact decimal expansion of the
double; DuckDB's ``round(DOUBLE, k)`` changed semantics across versions
(decimal-exact HALF_UP in recent builds vs multiply-and-nearbyint —
half-to-EVEN on the scaled value — in older ones). A query whose hashed
output contains a rounded double that lands exactly on a .5 boundary at
the gate SF is therefore a latent environment-dependent red of the
documents_dsir_weights class: green against the local DuckDB, red
against a driver whose DuckDB rounds the other way.

This tool measures that exposure DIRECTLY instead of guessing: every
oracle is executed twice on the same DuckDB — once verbatim, once with
every ``round(`` textually swapped to ``round_even(`` (banker's
rounding, the other historical semantics). Any value difference means
the query's output depends on WHICH round semantics the engine ships —
i.e. some value sits exactly on a boundary — and that query must stop
emitting round(double) into its hashed row (fixed-point integer column,
or the +1e-9 nudge idiom of portable_math.fixed_e6_expr which moves
exact boundaries off the knife edge consistently on both engines).

Queries that agree under BOTH semantics are immune to round-semantics
drift at this SF by measurement, not argument.

Usage: python tools/round_audit.py [sf_dir] [query ...]
Exit 1 if any query's output differs between the two round semantics.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as m  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def swap_round(sql: str) -> str:
    """Replace every round( call with round_even( — word-boundary match
    so round_even itself (none today) or column names containing
    'round' are untouched."""
    return re.sub(r"\bround\s*\(", "round_even(", sql)


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    at_risk, errors, immune, no_round = [], [], 0, 0
    for name, sql in sorted(m.oracle_sql().items()):
        if ONLY and name not in ONLY:
            continue
        if not re.search(r"\bround\s*\(", sql):
            no_round += 1
            continue
        try:
            base = con.execute(sql).fetchall()
            alt = con.execute(swap_round(sql)).fetchall()
        except Exception as exc:  # noqa: BLE001
            errors.append(name)
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        # value-level compare. Every value normalizes to ONE orderable
        # type (string): ints stay EXACT (coercing them to float would
        # equate BIGINTs differing beyond 2^53 — exactly the fixed-point
        # e6 columns this tool guards), floats go through repr (which
        # round-trips the exact double, so repr equality == bit-level
        # value equality), and NULLs/strings via str — a tuple mixing
        # float and str (any nullable DOUBLE column) used to raise
        # TypeError in the sort, crashing the audit (ADVICE r7 #1).
        def norm(rows):
            return sorted(
                tuple(
                    repr(v) if isinstance(v, float) else str(v)
                    for v in r
                )
                for r in rows
            )

        if norm(base) != norm(alt):
            at_risk.append(name)
            sb, sa = norm(base), norm(alt)
            # set-difference diff: the old positional zip paired sorted
            # rows by index, showing misaligned before/after values
            only_b = [r for r in sb if r not in sa][:2]
            only_a = [r for r in sa if r not in sb][:2]
            print(f"{name}: AT RISK (half-boundary value in output)")
            for b in only_b:
                print(f"  half_up only: {b}")
            for a in only_a:
                print(f"  half_even only: {a}")
        else:
            immune += 1
    print(
        f"\n{immune} immune by measurement, {no_round} no round() at all,"
        f" {len(at_risk)} at risk, {len(errors)} errors"
    )
    if at_risk:
        print("AT RISK:", ", ".join(at_risk))
    return 1 if at_risk or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
