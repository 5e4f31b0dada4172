"""Property-based tests (hypothesis) for the scalar-function layer and
merge semantics — the reference has none (SURVEY §5); pure column
functions make them cheap here."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from databridge_etl_tools_spark.functions import (
    force_2d,
    promote_to_multi,
    srid_of,
    strip_srid,
    with_srid,
)
from databridge_etl_tools_spark.functions.geometry_udf import (
    ewkb_to_point_wkt,
    point_wkt_to_ewkb,
)
from databridge_etl_tools_spark.functions.text import snakecase
from databridge_etl_tools_spark.operators import merge as M

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e7, max_value=1e7
)


def _vals(spark, values, fn):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r.y for r in df.select(fn(F.col("x")).alias("y")).collect()]


@settings(**_SETTINGS)
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=8), st.integers(0, 999999))
def test_srid_tag_strip_roundtrip(spark, pts, srid):
    wkts = [f"POINT ({x} {y})" for x, y in pts]
    df = spark.createDataFrame([(w,) for w in wkts], "x string")
    out = df.select(
        srid_of(with_srid(F.col("x"), srid)).alias("s"),
        strip_srid(with_srid(F.col("x"), srid)).alias("w"),
    ).collect()
    assert all(r.s == srid for r in out)
    assert [r.w for r in out] == wkts


@settings(**_SETTINGS)
@given(st.lists(st.tuples(finite, finite, finite), min_size=1, max_size=6))
def test_force_2d_idempotent(spark, pts):
    wkts = [f"POINT Z ({x} {y} {z})" for x, y, z in pts]
    once = _vals(spark, wkts, force_2d)
    twice = _vals(spark, once, force_2d)
    assert once == twice
    assert all("Z" not in w.split("(")[0] for w in once)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(finite, finite), min_size=3, max_size=6))
def test_multi_promotion_idempotent_and_kind(spark, ring):
    body = ",".join(f"{x} {y}" for x, y in ring)
    wkt = f"POLYGON(({body}))"
    once = _vals(spark, [wkt], lambda c: promote_to_multi(c, "MULTIPOLYGON"))[0]
    twice = _vals(spark, [once], lambda c: promote_to_multi(c, "MULTIPOLYGON"))[0]
    assert once.startswith("MULTIPOLYGON((")
    assert once == twice


@settings(**_SETTINGS)
@given(st.tuples(finite, finite), st.one_of(st.none(), st.integers(1, 999999)))
def test_wkb_codec_roundtrip(pt, srid):
    x, y = pt
    wkt = (f"SRID={srid};" if srid else "") + f"POINT ({_f(x)} {_f(y)})"
    assert ewkb_to_point_wkt(point_wkt_to_ewkb(wkt)) == wkt


def _f(v: float) -> str:
    return str(int(v)) if v == int(v) else repr(v)


@settings(**_SETTINGS)
@given(st.text(min_size=1, max_size=30))
def test_snakecase_output_is_normalized(label):
    s = snakecase(label)
    assert s == s.lower()
    assert "__" not in s
    assert not s.startswith("_") and not s.endswith("_")


@settings(**_SETTINGS)
@given(
    st.lists(st.tuples(st.integers(0, 20), st.text("ab", max_size=3)), max_size=12),
    st.lists(st.tuples(st.integers(0, 20), st.text("ab", max_size=3)), max_size=12),
)
def test_upsert_invariants(spark, prod_rows, staging_rows):
    # dedupe inputs by key (prod must be key-unique; staging dedupes
    # deterministically inside upsert)
    prod_map = dict(prod_rows)
    prod = spark.createDataFrame(
        [(k, v) for k, v in prod_map.items()] or [(None, None)], "k int, v string"
    ).where(F.col("k").isNotNull())
    staging = spark.createDataFrame(
        staging_rows or [(None, None)], "k int, v string"
    ).where(F.col("k").isNotNull())

    out = {r.k: r.v for r in M.upsert(prod, staging, ["k"], staging_order=[F.col("v")]).collect()}
    staged = {}
    for k, v in sorted(staging_rows, key=lambda t: (t[0], t[1])):
        staged.setdefault(k, v)  # first under (v) order per key
    expect = {**prod_map, **staged}
    assert out == expect


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),            # user
            st.integers(0, 240),          # offset seconds (hits exact gap boundaries)
            st.sampled_from(["view", "purchase"]),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_dynamic_session_native_equals_first_principles(spark, events):
    """session_window(dynamic gap) == the lag/running-max twin on
    adversarial inputs: duplicate timestamps, events landing exactly
    on a session close boundary, interleaved gap policies."""
    from databridge_etl_tools_spark.streaming import events as SE

    rows = [
        (i, f"2024-01-01 00:{off // 60:02d}:{off % 60:02d}", u, et)
        for i, (u, off, et) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_str string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts_str").cast("timestamp_ntz")).drop("ts_str")

    gaps = {"purchase": "2 minutes"}
    native = SE.sessionize_dynamic(df, SE.dynamic_gap("1 minute", gaps))
    twin = SE.sessionize_batch_dynamic(df, SE.dynamic_gap_us("1 minute", gaps))
    n = {(r.user_id, str(r.session_start)): r.n_events for r in native.collect()}
    t = {(r.user_id, str(r.session_start)): r.n_events for r in twin.collect()}
    assert n == t


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(0, 60 * 24 * 40), min_size=1, max_size=25, unique=True),
    st.lists(
        st.tuples(st.integers(0, 60 * 24 * 40), st.integers(0, 60 * 24 * 5)),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([60, 720, 1440]),
)
def test_interval_join_equals_naive_property(spark, point_mins, ivs, width):
    """Bucketized interval join (inner AND left-outer) equals the
    naive cross-join filter on arbitrary point/interval layouts —
    incl. empty intervals (start == end, half-open → match nothing),
    boundary-bucket landings, and multi-overlap points."""
    from databridge_etl_tools_spark.operators.rangejoin import interval_join

    base = "2024-01-01 00:00:00"
    pts = spark.createDataFrame(
        [(i, m) for i, m in enumerate(point_mins)], "pid int, m int"
    ).select(
        "pid",
        F.timestamp_add("MINUTE", F.col("m"), F.lit(base).cast("timestamp_ntz")).alias("ts"),
    )
    iv = spark.createDataFrame(
        [(j, s, s + d) for j, (s, d) in enumerate(ivs)], "iid int, s int, e int"
    ).select(
        "iid",
        F.timestamp_add("MINUTE", F.col("s"), F.lit(base).cast("timestamp_ntz")).alias("ts_start"),
        F.timestamp_add("MINUTE", F.col("e"), F.lit(base).cast("timestamp_ntz")).alias("ts_end"),
    )
    naive = {
        (r.pid, r.iid)
        for r in pts.crossJoin(iv)
        .where((F.col("ts") >= F.col("ts_start")) & (F.col("ts") < F.col("ts_end")))
        .collect()
    }
    inner = {
        (r.pid, r.iid)
        for r in interval_join(pts, iv, "ts", "ts_start", "ts_end", width).collect()
    }
    assert inner == naive
    left = [
        (r.pid, r.iid)
        for r in interval_join(
            pts, iv, "ts", "ts_start", "ts_end", width, how="left"
        ).collect()
    ]
    matched = {p for p, _ in naive}
    expect_left = sorted(naive | {(p, None) for (p, _) in enumerate(point_mins) if p not in matched})
    assert sorted(left) == expect_left


# ---- PII scrub: Spark (Java regex) vs pure-python re twin ----------

import re as _re

from databridge_etl_tools_spark.operators.pii import PII_PATTERNS, pii_scrub


def _py_scrub(text: str):
    counts = {}
    out = text
    for kind, pat in PII_PATTERNS.items():
        counts[kind] = len(_re.findall(pat, out))
        out = _re.sub(pat, f"[{kind.upper()}]", out)
    return out, counts


_pii_atoms = st.sampled_from(
    [
        "alice@example.com",
        "x123-456-7890@corp.example.org",
        "215-555-0199",
        "12345-678-9012",
        "10.0.0.1",
        "192.168.001.010",
        "1.2.3",
        "plain",
        "words",
        "a#b",
        "...",
        "v2.0.1.9",
        "@not-an-email",
        "user@@double.com",
    ]
)


@settings(**_SETTINGS)
@given(st.lists(_pii_atoms, min_size=0, max_size=12))
def test_pii_scrub_matches_python_re(spark, atoms):
    """The scrub chain must behave identically under Java regex
    (Spark), RE2 (DuckDB oracle), and python re — the patterns are
    restricted to the common-semantics subset, so python re is a fair
    independent twin."""
    text = " ".join(atoms)
    df = spark.createDataFrame([(text,)], "t string")
    r = df.select(pii_scrub("t").alias("s")).select("s.*").first()
    exp_out, exp_counts = _py_scrub(text)
    assert r.redacted == exp_out
    assert (r.n_email, r.n_phone, r.n_ipv4) == (
        exp_counts["email"],
        exp_counts["phone"],
        exp_counts["ipv4"],
    )


@settings(**_SETTINGS)
@given(
    st.lists(
        st.sampled_from(
            ["the", "cat", "cat", "sat", "#", "...", "a1", "42", "of", "x"]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_gopher_rules_match_python_twin(spark, words):
    """Each Gopher rule recomputed independently in python must agree
    with the codegen'd struct."""
    from databridge_etl_tools_spark.operators.textstats import (
        GOPHER_REQUIRED_WORDS,
        gopher_rules,
    )

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "t string")
    r = (
        df.select(gopher_rules("t", min_words=2, max_words=15).alias("g"))
        .select("g.*")
        .first()
    )
    toks = [t for t in text.split() if t]
    n = len(toks)
    wl = sum(len(t) for t in toks) / n if n else 0.0
    sym = text.count("#") + len(_re.findall(r"\.\.\.|…", text))
    alpha = sum(1 for t in toks if _re.search("[A-Za-z]", t))
    req = sum(1 for w in GOPHER_REQUIRED_WORDS if w in {t.lower() for t in toks})
    assert r.words_ok == (2 <= n <= 15)
    assert r.word_len_ok == (3.0 <= wl <= 10.0)
    assert r.symbol_ok == (n > 0 and sym / n <= 0.1)
    assert r.alpha_ok == (n > 0 and alpha / n >= 0.8)
    assert r.stopword_ok == (req >= 2)


@settings(**_SETTINGS)
@given(
    n_tokens=st.integers(min_value=0, max_value=60),
    size=st.integers(min_value=1, max_value=12),
    stride=st.integers(min_value=1, max_value=12),
)
def test_chunking_covers_tokens_exactly(spark, n_tokens, size, stride):
    """Chunking invariants for arbitrary (n, size, stride):
    - disjoint mode (stride == size) partitions the token list exactly
      (each token in exactly one chunk, concatenation restores the doc);
    - any mode: starts are 0, stride, 2·stride… < max(n, 1), every
      chunk is the true slice, and when stride <= size every token
      index is covered by at least one window."""
    from databridge_etl_tools_spark.operators.chunking import chunk_documents

    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        (r.chunk_start, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(df, size=size, stride=stride).collect()
    )
    want_starts = list(range(0, max(n_tokens, 1), stride))
    assert [s for s, _, _ in rows] == want_starts
    for s, text, m in rows:
        want = toks[s : s + size]
        assert text == " ".join(want) and m == len(want)
    if stride == size:
        flat = [w for s, text, _ in rows for w in (text.split() if text else [])]
        assert flat == toks
    if stride <= size and n_tokens:
        covered = set()
        for s, _, m in rows:
            covered.update(range(s, s + m))
        assert covered == set(range(n_tokens))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.integers(1, 50), min_size=2, max_size=12, unique=False),
    st.integers(0, 3),
)
def test_sample_weighted_monotone_in_weight(spark, weights, bump_idx):
    """Raising one row's weight can only ADD it to the sample, never
    evict it or any other row (per-row hash fates are independent and
    the accept threshold is monotone in w) — provided max(weight) is
    unchanged. Bump a non-max row toward the max and compare."""
    from databridge_etl_tools_spark.operators.sampling import sample_weighted

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    kept1 = {r["doc_id"] for r in sample_weighted(df, "w", "doc_id").collect()}
    i = bump_idx % len(rows)
    wmax = max(weights)
    bumped = [(j, wmax if j == i else w) for j, w in rows]
    df2 = spark.createDataFrame(bumped, "doc_id bigint, w bigint")
    kept2 = {r["doc_id"] for r in sample_weighted(df2, "w", "doc_id").collect()}
    assert kept1 - {i} <= kept2  # nobody else's fate moved
    assert kept1 <= kept2 | {i}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=3),
                min_size=1, max_size=30))
def test_countmin_additive_under_corpus_split(spark, toks):
    """CMS additivity: sketch(A ∪ B) == sketch(A) + sketch(B) counter-
    wise — the property that makes it a valid streaming aggregate."""
    from databridge_etl_tools_spark.operators.sketch import countmin_table

    half = len(toks) // 2
    def tab(ts):
        if not ts:
            return {}
        df = spark.createDataFrame([(t,) for t in ts], "token string")
        counts = df.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
        return {
            (r["lane"], r["bucket"]): r["bucket_n"]
            for r in countmin_table(counts, width=8).collect()
        }
    whole, a, b = tab(toks), tab(toks[:half]), tab(toks[half:])
    merged = dict(a)
    for k, v in b.items():
        merged[k] = merged.get(k, 0) + v
    assert whole == merged


@given(
    st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=60),
    st.data(),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_kth_smallest_matches_sorted_list(spark, vals, data):
    """Bucketed selection == python sorted()[k-1] for arbitrary
    integer multisets and arbitrary valid ranks, including forced
    multi-level recursion (tiny buckets, tiny exact cap)."""
    from databridge_etl_tools_spark.operators.orderstats import kth_smallest

    ks = data.draw(
        st.lists(
            st.integers(1, len(vals)), min_size=1, max_size=3, unique=True
        )
    )
    df = spark.createDataFrame([(v,) for v in vals], "x bigint")
    got = kth_smallest(df, "x", ks, buckets=4, max_rows_exact=4)
    s = sorted(vals)
    assert got == {k: s[k - 1] for k in ks}


def test_profile_columns_nulls_nan_numeric_ordering(spark):
    """profile_columns: numeric min/max use NUMERIC ordering (not the
    string form's lexicographic), NaN counts as a distinct value but
    never wins min/max, nulls counted per column."""
    import math

    from databridge_etl_tools_spark.operators.profile import profile_columns

    rows = [
        (9, 1.5, "b"),
        (10, float("nan"), None),
        (None, -2.0, "a"),
        (2, None, "a"),
    ]
    df = spark.createDataFrame(rows, "i bigint, d double, s string")
    got = {r["col_name"]: r for r in profile_columns(df, ["i", "d", "s"]).collect()}
    assert got["i"]["n_rows"] == 4 and got["i"]["n_null"] == 1
    assert (got["i"]["min_value"], got["i"]["max_value"]) == ("2", "10")  # numeric
    assert got["i"]["n_distinct"] == 3
    assert (got["d"]["min_value"], got["d"]["max_value"]) == ("-2.0", "1.5")  # NaN out
    assert got["d"]["n_distinct"] == 3  # NaN is a value
    assert got["s"]["n_null"] == 1 and got["s"]["n_distinct"] == 2
    assert (got["s"]["min_value"], got["s"]["max_value"]) == ("a", "b")
