"""Cross-engine bit-identical ``ln`` — transcendentals without libm.

WHY. IEEE 754 requires the basic operations (+, -, *, /, comparisons,
int->double and correctly-parsed string->double conversions) to be
CORRECTLY ROUNDED: given the same inputs and the same expression tree,
every conforming engine — the JVM executing Spark's codegen and the
C++ runtime under DuckDB alike — produces the same 64 bits. It does
NOT require that of transcendental functions: ``java.lang.Math.log``
and DuckDB's libm ``ln`` may legitimately disagree by one ulp on the
same rational input. Round 4/5 driver snapshots showed exactly that
failure mode on ``documents_dsir_weights``: a vocab row's log-ratio sat
within one ulp of a 1e-6 rounding boundary, the two engines landed on
opposite sides, and the fixed-point BIGINT flipped by 1 (VERDICT r5
"What's wrong" #1).

HOW. This module therefore computes ``ln(x)`` for integer-valued
``x >= 1`` using ONLY the correctly-rounded basic ops, as a generated
SQL expression chain that BOTH engines parse into the same tree:

    e  = floor(log2(x))          -- 62-branch CASE on exact 2^k doubles
    m  = x / 2^e                 -- exact (division by a power of two)
    z  = (m - 1) / (m + 1)       -- z in [0, 1/3] for m in [1, 2)
    ln(m) = 2z * (1 + z^2/3 + z^4/5 + ...)     -- atanh series, Horner
    ln(x) = e * LN2 + ln(m)      -- LN2 a parsed string literal

Every constant is emitted as ``CAST('<python repr>' AS DOUBLE)`` —
string->double parsing is correctly rounded on both engines, whereas a
bare ``0.333...`` literal is DECIMAL-typed by both Spark and DuckDB
and would take an engine-chosen promotion path. The result is NOT the
correctly-rounded true ``ln`` (the 13-term series carries ~5e-15
absolute error) — it does not need to be. It needs to be THE SAME
double on both engines, and it is, by construction: identical parse
tree, identical IEEE basic ops, no libm anywhere.

Accuracy: z <= 1/3 so the first dropped term is bounded by
z^27/27 <= (1/3)^27 / 27 ~ 4.9e-15; with e <= 62 the additional
representation error of ``e * LN2`` stays below 1e-14 absolute. All
consumers quantize at 1e-6 (or 1e-9 for sampling log-keys), so the
shared value is well inside every boundary the true ln would satisfy.

Scale: the chain is a per-row projection (two 62-branch CASEs + ~30
fused multiply/adds) inside whole-stage codegen — no shuffle, no UDF,
no state; cost is noise next to the hash/explode work of its callers.

Used by ``operators/dsir.py`` (log likelihood ratios),
``operators/stats.py:weighted_sample`` (Efraimidis-Spirakis log-keys)
and the ``retention_halflife_fit`` decay fit — every driver-gated
query whose output quantizes a logarithm.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: series terms; first dropped term <= (1/3)^(2*N_TERMS+1) ~ 4.9e-15
_N_TERMS = 13

#: max exponent handled; BIGINT inputs are < 2^63
_MAX_EXP = 62


def dlit(v: float) -> str:
    """A double literal both engines parse to the same 64 bits.

    ``repr`` round-trips doubles exactly and string->double parsing is
    correctly rounded (IEEE 754 §5.12.2) on the JVM and in DuckDB; a
    bare decimal literal would be DECIMAL-typed by both parsers and
    reach DOUBLE via an engine-chosen cast instead."""
    return f"CAST('{v!r}' AS DOUBLE)"


#: ln(2) as a shared parsed literal (never engine libm)
LN2_LIT = dlit(math.log(2.0))


def ln_steps(arg: str, out: str) -> list[tuple[str, str]]:
    """The (column, expression) chain computing ``out`` = portable
    ln(``arg``) for an integer-valued SQL expression ``arg`` >= 1.
    Apply the steps IN ORDER on either engine; every expression uses
    only correctly-rounded IEEE ops, so the final double is
    bit-identical across Spark and DuckDB. Intermediates are prefixed
    ``__{out}_`` and safe to drop afterwards."""
    x, e, p, m, z, t = (f"__{out}_{s}" for s in ("x", "e", "p", "m", "z", "t"))
    e_case = " ".join(
        f"WHEN {x} >= {dlit(float(2 ** k))} THEN {dlit(float(k))}"
        for k in range(_MAX_EXP, 0, -1)
    )
    p_case = " ".join(
        f"WHEN {x} >= {dlit(float(2 ** k))} THEN {dlit(float(2 ** k))}"
        for k in range(_MAX_EXP, 0, -1)
    )
    one, two = dlit(1.0), dlit(2.0)
    poly = dlit(1.0 / (2 * _N_TERMS - 1))
    for i in range(_N_TERMS - 2, -1, -1):
        poly = f"({dlit(1.0 / (2 * i + 1))} + {t} * {poly})"
    return [
        (x, f"CAST({arg} AS DOUBLE)"),
        (e, f"CASE {e_case} ELSE {dlit(0.0)} END"),
        (p, f"CASE {p_case} ELSE {dlit(1.0)} END"),
        (m, f"{x} / {p}"),
        (z, f"({m} - {one}) / ({m} + {one})"),
        (t, f"{z} * {z}"),
        (out, f"{e} * {LN2_LIT} + ({two} * {z}) * {poly}"),
    ]


def with_ln(df: DataFrame, arg: str, out: str) -> DataFrame:
    """Spark side: append column ``out`` = portable ln(``arg``),
    dropping the intermediates. One codegen projection, no shuffle."""
    steps = ln_steps(arg, out)
    for name, expr in steps:
        df = df.withColumn(name, F.expr(expr))
    return df.drop(*[name for name, _ in steps[:-1]])


#: the magnitude-proportional half of the round nudge: 2^-40 relative
#: shift — bigger than 0.5 ulp at EVERY magnitude (so it never gets
#: absorbed by the IEEE add the way a bare +1e-9 does past |x| ~ 2^24)
#: yet 10^-12 relative, far below any rounding-precision gap in use
NUDGE_REL_LIT = dlit(2.0 ** -40)


def nudge_sql(x: str) -> str:
    """The shared nudge expression string for oracle SQL:
    ``x + 1e-9 + abs(x) * 2^-40`` — see :func:`round_nudged`."""
    return f"({x}) + 1e-9 + abs({x}) * {NUDGE_REL_LIT}"


def round_nudged(col, k: int):
    """CONVENTION (round-semantics immunity, tools/round_audit.py): a
    hashed double produced by ``round(x, k)`` where x can land EXACTLY
    on a .5 boundary at the rounding precision (integer ratios with
    power-of-two denominators, e.g. n/64 -> .40625) is environment-
    dependent — Spark rounds HALF_UP on the exact decimal while
    DuckDB's round(DOUBLE) semantics changed across versions
    (multiply-and-nearbyint = half-to-EVEN historically). Nudging
    BEFORE the round moves exact boundaries strictly upward (for
    x >= 0; symmetric-in-expression for x < 0) on BOTH engines — the
    identical correctly-rounded IEEE ops — so either semantics then
    agrees. The nudge is ``+ 1e-9 + |x|·2^-40``: the absolute term
    covers tiny magnitudes, the RELATIVE term keeps the shift above
    one ulp at every magnitude (a bare +1e-9 is silently absorbed by
    the add once |x| >= ~2^24 — a cent sum of $17M — reinstating the
    boundary). Mirror in the oracle via :func:`nudge_sql`. Never use
    on the fixed_e6_expr integer-target path, which has its own
    convention."""
    from pyspark.sql import functions as _F

    return _F.round(
        col + _F.lit(1e-9) + _F.abs(col) * _F.lit(2.0 ** -40), k
    )


def fixed_e6_expr(x: str) -> str:
    """``round(1e6 * x)`` as a BIGINT — the shared quantization tail
    every portable-ln consumer applies ONCE per row before integer
    aggregation (identical string on both engines; round-half-away and
    the truncating/rounding BIGINT casts agree on integral doubles)."""
    return f"CAST(round(({x}) * 1000000.0 + 1e-9, 0) AS BIGINT)"


def lr_e6_expr(lnct: str, lndt: str, lncs: str, lnds: str) -> str:
    """The DSIR per-vocab-row fixed-point log-ratio
    ``round(1e6 * (ln(c_tgt+1)/denom_t ratio - ln(c_src+1)/denom_s
    ratio))`` as ONE shared expression string over four portable-ln
    columns — the combination arithmetic must also be the identical
    tree on both engines, so it lives here next to the lns it
    consumes."""
    return fixed_e6_expr(f"({lnct} - {lndt}) - ({lncs} - {lnds})")


#: exp series terms; |t| < ln2 so the first dropped term is
#: < 0.694^18/18! ~ 2.2e-19
_EXP_TERMS = 18

#: 2^x underflow cut: below this the e6-quantized consumers see exactly 0
_EXP2_MIN = -64


def exp2_steps(arg: str, out: str) -> list[tuple[str, str]]:
    """The (column, expression) chain computing ``out`` = portable
    2**``arg`` for a DOUBLE-valued expression with ``arg`` < 64
    (``arg`` <= -64 yields exactly 0.0 — its consumers quantize at 1e-6
    where true 2^-64 ~ 5.4e-20 rounds to 0 anyway; ``arg`` >= 64 yields
    +Infinity so an out-of-contract overflow is loud, never a silent 0). Same contract as
    :func:`ln_steps`: only correctly-rounded IEEE basic ops (floor is
    exact by IEEE 754 §5.9), so the result is bit-identical across
    Spark and DuckDB — unlike libm ``pow``, which the two engines may
    round differently by one ulp. Decomposition: x = i + f with
    i = floor(x), 2^x = 2^i * exp(f·ln2) with the exponential by a
    Python-literal-coefficient Taylor-Horner over f·ln2 in [0, ln 2)."""
    x, i, p, t = (f"__{out}_{s}" for s in ("x", "i", "p", "t"))
    p_case = " ".join(
        f"WHEN {i} = {dlit(float(k))} THEN {dlit(2.0 ** k)}"
        for k in range(63, _EXP2_MIN - 1, -1)
    )
    poly = dlit(1.0 / math.factorial(_EXP_TERMS - 1))
    for n in range(_EXP_TERMS - 2, -1, -1):
        poly = f"({dlit(1.0 / math.factorial(n))} + {t} * {poly})"
    return [
        (x, f"CAST({arg} AS DOUBLE)"),
        (i, f"floor({x})"),
        (p, f"CASE {p_case} ELSE {dlit(0.0)} END"),
        (t, f"({x} - {i}) * {LN2_LIT}"),
        (
            out,
            # arg >= 64 is out of contract: return Infinity (both
            # engines parse the literal) so an overflow-side violation
            # is LOUD downstream instead of a silent 0.0 — the
            # maximally wrong value for an overflow (ADVICE r6)
            f"CASE WHEN {x} <= {dlit(float(_EXP2_MIN))} THEN {dlit(0.0)}"
            f" WHEN {x} >= {dlit(64.0)} THEN CAST('Infinity' AS DOUBLE)"
            f" ELSE {p} * {poly} END",
        ),
    ]


def with_exp2(df: DataFrame, arg: str, out: str) -> DataFrame:
    """Spark side: append column ``out`` = portable 2**``arg``,
    dropping the intermediates. One codegen projection, no shuffle."""
    steps = exp2_steps(arg, out)
    for name, expr in steps:
        df = df.withColumn(name, F.expr(expr))
    return df.drop(*[name for name, _ in steps[:-1]])


def exp2_select_sql(inner: str, pairs: list[tuple[str, str]]) -> str:
    """Oracle side: wrap ``inner`` in the select chain appending each
    ``out`` = portable 2**``arg`` (the verbatim :func:`with_exp2`
    steps)."""
    q = inner
    for arg, out in pairs:
        for name, expr in exp2_steps(arg, out):
            q = f"SELECT *, {expr} AS {name} FROM ({q})"
    return q


def pmi_expr() -> str:
    """Pointwise mutual information ln((c12/B)/((ca/T)(cb/T))) as the
    overflow-free five-ln decomposition ln(c12)+2·ln(T)-ln(B)-ln(ca)
    -ln(cb) over portable-ln columns ``__lnc12 __lnca __lncb __lnt
    __lnb``, rounded at 6dp — one shared tree for both engines (a
    product-argument form would overflow BIGINT once T² · c12 passes
    2^63, which a web corpus does)."""
    return (
        "round(((__lnc12 - __lnb) + (__lnt - __lnca))"
        " + (__lnt - __lncb), 6)"
    )


def ln_select_sql(inner: str, pairs: list[tuple[str, str]]) -> str:
    """Oracle side: wrap ``inner`` (a SQL query string) in the select
    chain that appends each ``out`` = portable ln(``arg``) — the SAME
    step expressions :func:`with_ln` runs on Spark, so both engines
    evaluate the identical tree. Intermediates remain in scope (the
    consuming outer SELECT simply doesn't project them)."""
    q = inner
    for arg, out in pairs:
        for name, expr in ln_steps(arg, out):
            q = f"SELECT *, {expr} AS {name} FROM ({q})"
    return q


def sdiv_scaled_sql(num: str, den: str, scale: int, floordiv: str) -> str:
    """Sign-split scaled integer division as a SQL string:
    ``sign(num) * ((|num| * scale) intdiv den)`` for ``den > 0``.
    Splitting the sign makes Spark's truncating ``DIV`` and DuckDB's
    flooring ``//`` compute the identical value (they differ only on
    negative operands), so callers pass ``floordiv='DIV'`` on the
    Spark side and ``'//'`` in the oracle and hash the same BIGINT.
    Used by modularity/AUC-style fixed-point ratios wherever the
    numerator can go negative."""
    return (
        f"CASE WHEN ({num}) >= 0"
        f" THEN (({num}) * {scale}) {floordiv} ({den})"
        f" ELSE -((-({num}) * {scale}) {floordiv} ({den})) END"
    )


def big_e6_div_sql(num: str, den: str, floordiv: str) -> str:
    """EXACT ``floor(num * 1e6 / den)`` for NON-NEGATIVE ``num`` and
    positive ``den`` too large for sdiv_scaled_sql's single multiply
    (which overflows int64 once num > ~9.2e12): the e6 scale applies
    in two thousand-steps against the running remainder, so every
    intermediate stays < den * 1000. Exact while ``den < 2^63 / 1000``
    (~9.2e15) — the callers state their own magnitude gates against
    that bound. All three division/modulo sites are non-negative, so
    Spark ``DIV``/``%`` and DuckDB ``//``/``%`` agree with no sign
    split; pass ``floordiv`` = ``'DIV'`` (Spark) or ``'//'`` (oracle)."""
    q = f"(({num}) {floordiv} ({den}))"
    r1 = f"(({num}) % ({den}))"
    a = f"(({r1} * 1000) {floordiv} ({den}))"
    r2 = f"((({r1} * 1000) % ({den})))"
    b = f"((({r2} * 1000)) {floordiv} ({den}))"
    return f"({q} * 1000000 + {a} * 1000 + {b})"


#: chi-square 95th-percentile critical values at 1..10 dof, e6 BIGINT —
#: the shared literal table (BH_CRIT convention: no runtime inverse CDF
#: on either engine) the Friedman / Benford / CMH-style gates read.
CHI2_CRIT_95_E6 = {
    1: 3_841_459,
    2: 5_991_465,
    3: 7_814_728,
    4: 9_487_729,
    5: 11_070_498,
    6: 12_591_587,
    7: 14_067_140,
    8: 15_507_313,
    9: 16_918_978,
    10: 18_307_038,
}


def chi2_crit_95_e6_sql(dof: str) -> str:
    """The CHI2_CRIT_95_E6 lookup as one shared CASE expression over a
    runtime ``dof`` column (1..10; NULL outside the table) — identical
    text on both engines."""
    arms = " ".join(
        f"WHEN ({dof}) = {d} THEN CAST({v} AS BIGINT)"
        for d, v in CHI2_CRIT_95_E6.items()
    )
    return f"(CASE {arms} ELSE CAST(NULL AS BIGINT) END)"
