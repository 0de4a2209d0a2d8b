"""Property-based tests (hypothesis) for the parser semantics pinned in
SURVEY §7.3: datetime format dialects, the 1e10 epoch boundary, null-token
casing. Values are generated in batches and pushed through Spark in ONE
action per example set — hypothesis drives the data, not the job count."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from firebase_etl_spark.functions.cleaning import NULL_TOKENS, clean_string
from firebase_etl_spark.functions.timestamps import parse_datetime


def _reference_parse(v):
    """Driver-side reimplementation of the reference's parse order
    (user_transformer.py:83-148) for cross-checking."""
    if v is None:
        return None
    s = str(v).strip()
    for fmt in (
        "%Y-%m-%d %H:%M:%S",
        "%Y-%m-%dT%H:%M:%S",
        "%Y-%m-%dT%H:%M:%S.%f",
        "%Y-%m-%d",
    ):
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            pass
    try:
        num = float(s)
    except ValueError:
        return None
    import math

    if math.isnan(num) or math.isinf(num):
        return None
    if abs(num) > 1e10:
        return dt.datetime.fromtimestamp(num / 1000.0, dt.timezone.utc).replace(
            tzinfo=None
        )
    return dt.datetime.fromtimestamp(num, dt.timezone.utc).replace(tzinfo=None)


_dt_strategy = st.one_of(
    st.datetimes(
        min_value=dt.datetime(1971, 1, 1), max_value=dt.datetime(2100, 1, 1)
    ).map(lambda d: d.replace(microsecond=0).strftime("%Y-%m-%d %H:%M:%S")),
    st.datetimes(
        min_value=dt.datetime(1971, 1, 1), max_value=dt.datetime(2100, 1, 1)
    ).map(lambda d: d.replace(microsecond=0).isoformat()),
    st.dates(min_value=dt.date(1971, 1, 1), max_value=dt.date(2100, 1, 1)).map(
        lambda d: d.isoformat()
    ),
    st.integers(min_value=0, max_value=4_000_000_000).map(str),          # epoch sec
    st.integers(min_value=10_000_000_001, max_value=4_000_000_000_000).map(str),  # ms
    st.sampled_from(["NaT", "nan", "", "garbage", "2024-13-45", None]),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_dt_strategy, min_size=1, max_size=60))
def test_parse_datetime_matches_reference(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r[0] for r in df.select(parse_datetime(F.col("v")).alias("o")).collect()]
    expected = [_reference_parse(v) for v in values]
    for v, g, e in zip(values, got, expected):
        assert g == e, f"input {v!r}: spark={g!r} reference={e!r}"


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.sampled_from(
                [t.upper() for t in NULL_TOKENS if t]
                + [t.capitalize() for t in NULL_TOKENS if t]
                + ["  ", "", None]
            ),
            st.text(
                alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_clean_string_null_domain(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [r[0] for r in df.select(clean_string(F.col("v")).alias("o")).collect()]
    for v, g in zip(values, got):
        if v is None or v.strip().lower() in NULL_TOKENS:
            assert g is None, f"{v!r} should clean to NULL, got {g!r}"
        else:
            assert g == v.strip()


@given(
    st.lists(
        st.one_of(
            st.text(max_size=40),
            st.integers(-(10**12), 10**12),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=200, deadline=None)
def test_sqlstore_pushdown_binds_any_value_safely(values):
    """Pushed filter values travel as bind PARAMETERS, so ANY string or
    number — quotes, backslashes, NUL bytes, unicode, floats that would
    parse as DECIMAL literals — must round-trip through the database
    comparison and match exactly the stored value. (Literal inlining
    failed this: NUL truncated the statement, bare decimals changed
    float comparison semantics.)"""
    import duckdb

    from pyspark.sql.datasource import EqualTo

    from firebase_etl_spark.sources.sqlstore_datasource import SqlStoreReader

    for v in values:
        r = SqlStoreReader({"path": "unused", "table": "t"}, None)
        leftover = list(r.pushFilters([EqualTo(("c",), v)]))
        assert leftover == []
        typ = (
            "DOUBLE"
            if isinstance(v, float)
            else ("BIGINT" if isinstance(v, int) else "VARCHAR")
        )
        con = duckdb.connect()
        try:
            con.execute(f"CREATE TABLE t (c {typ})")
            con.execute("INSERT INTO t VALUES (?)", [v])
            n = con.execute(
                f"SELECT count(*) FROM t WHERE {' AND '.join(r.pushed)}",
                r.pushed_params,
            ).fetchone()[0]
        finally:
            con.close()
        assert n == 1, (v, r.pushed, r.pushed_params)


_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=12),
        min_size=4,
        max_size=12,
    )
)
@settings(max_examples=5, deadline=None)
def test_prefix_filter_equals_brute_force_random(spark, corpora):
    """Losslessness of the prefix filter on RANDOM corpora — any false
    negative (a pair the prefix blocking skips) or false positive shows
    up as a set difference vs the O(n^2) exact join."""
    from firebase_etl_spark.operators.dedup_approx import (
        brute_force_near_dups,
        prefix_filter_near_dups,
    )

    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pf = sorted(map(tuple, prefix_filter_near_dups(df, 0.5, 2).collect()))
    bf = sorted(
        map(
            tuple,
            brute_force_near_dups(df, 0.5, 2)
            .select("id_a", "id_b", "jaccard")
            .collect(),
        )
    )
    assert pf == bf


@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=5, deadline=None)
def test_duplicate_windows_match_python_recount(spark, corpora):
    """duplicate_window_report vs a direct Python recount of every
    k-token window on random corpora."""
    from collections import Counter

    from firebase_etl_spark.operators.text import duplicate_window_report

    k = 3
    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_windows"],
            r["n_dup_windows"],
            r["n_cross_doc_windows"],
        )
        for r in duplicate_window_report(df, k=k).collect()
    }
    wins = {
        i: [tuple(t[j : j + k]) for j in range(len(t) - k + 1)]
        for i, t in ((i, toks) for i, toks in enumerate(corpora))
    }
    total = Counter(w for ws in wins.values() for w in ws)
    docs_per = Counter(w for ws in wins.values() for w in set(ws))
    for i, ws in wins.items():
        n_dup = sum(1 for w in ws if total[w] > 1)
        n_cross = sum(1 for w in ws if docs_per[w] > 1)
        assert got[i] == (len(ws), n_dup, n_cross), (i, corpora)


@given(
    st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=12
    ),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=8, deadline=None)
def test_passage_chunks_cover_every_token(doc_lens, chunk, stride):
    """For stride <= chunk, every token position of every document is
    covered by at least one chunk, chunk texts reassemble from the
    original tokens at their claimed offsets, and the chunk count obeys
    1 + ceil(max(0, n-chunk)/stride). One Spark action per example."""
    import math

    from firebase_etl_spark.operators.text import passage_chunks
    from firebase_etl_spark.session import get_spark

    stride = min(stride, chunk)  # coverage only promised for overlap mode
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n)))
        for i, n in enumerate(doc_lens)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = passage_chunks(df, chunk_tokens=chunk, stride=stride).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(doc_lens):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        assert len(chunks) == 1 + math.ceil(max(0, n - chunk) / stride)
        covered = set()
        toks = rows[i][1].split(" ")
        for r in chunks:
            s, ln = r["start_tok"], r["n_toks"]
            assert r["chunk_text"] == " ".join(toks[s : s + ln])
            covered |= set(range(s, s + ln))
        assert covered == set(range(n))


@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=2, max_size=12),
        min_size=3,
        max_size=10,
    )
)
@settings(max_examples=5, deadline=None)
def test_containment_equals_python_brute_force_random(spark, corpora):
    """Losslessness of the containment prefix filter on RANDOM corpora
    vs a direct Python recount of |A∩B|/|A| over all ordered pairs — a
    false negative from the asymmetric prefix/positional pruning would
    show as a missing pair."""
    from firebase_etl_spark.operators.dedup_approx import (
        containment_near_dups,
    )

    t, n = 0.6, 2
    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]

    def shingles(toks):
        return {
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        }

    sh = {i: shingles(toks) for i, toks in enumerate(corpora)}
    expect = sorted(
        (a, b, len(sa), len(sb), round(len(sa & sb) / len(sa), 6))
        for a, sa in sh.items()
        for b, sb in sh.items()
        if a != b and sa and sb and len(sa & sb) / len(sa) >= t
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        map(tuple, containment_near_dups(df, t, n).collect())
    )
    assert got == expect


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=4, deadline=None)
def test_label_propagation_distributed_equals_local_random(spark, raw_edges):
    """LPA path parity on random graphs: the distributed vote loop and
    the driver-local twin must agree bit-for-bit (same fixed rounds,
    same min-label tie-break)."""
    from firebase_etl_spark.operators.graph import label_propagation

    edges = sorted({(a, b) for a, b in raw_edges if a < b})
    if not edges:
        edges = [(0, 1)]
    df = spark.createDataFrame(edges, "p1 long, p2 long")
    local = sorted(
        map(tuple, label_propagation(df, n_iter=4).collect())
    )
    dist = sorted(
        map(
            tuple,
            label_propagation(df, n_iter=4, local_edge_threshold=0).collect(),
        )
    )
    assert local == dist


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=4, deadline=None)
def test_kcore_matches_python_fixpoint_random(spark, raw_edges):
    """k-core vs a direct Python fixpoint on random graphs, both paths:
    the summary (nodes, edges, converged) must equal the true k-core."""
    from collections import Counter

    from firebase_etl_spark.operators.graph import kcore_summary

    edges = sorted({(a, b) for a, b in raw_edges if a < b})
    if not edges:
        edges = [(0, 1)]

    def true_core(k):
        cur = list(edges)
        while True:
            deg = Counter()
            for a, b in cur:
                deg[a] += 1
                deg[b] += 1
            nxt = [(a, b) for a, b in cur if deg[a] >= k and deg[b] >= k]
            if len(nxt) == len(cur):
                nodes = {n for p in cur for n in p}
                return (len(nodes), len(cur), True)
            cur = nxt

    expect = {k: true_core(k) for k in (2, 3)}
    df = spark.createDataFrame(edges, "p1 long, p2 long")
    for thresh in (0, 2_000_000):
        got = {
            r["k"]: (r["n_core_nodes"], r["n_core_edges"], r["converged"])
            for r in kcore_summary(
                df, ks=(2, 3), local_edge_threshold=thresh
            ).collect()
        }
        assert got == expect, f"threshold={thresh}"
