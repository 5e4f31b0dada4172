"""Z-order clustering: measured data-skipping contrast vs a
time-sorted layout, content identity, and the interleave contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from databridge_etl_tools_spark.operators.zorder import (
    file_column_ranges,
    overlap_fraction,
    write_zordered,
    zvalue,
)
from databridge_etl_tools_spark.registry import table

SF = "/root/testdata/sf0.001"


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame([(5, 3), (0, 0), (65535, 0)], "a bigint, b bigint")
    got = [r.z for r in df.select(zvalue(["a", "b"]).alias("z")).collect()]
    # a=5 (101), b=3 (011) → bits a0,b0,a1,b1,a2,b2 = 1,1,0,1,1,0 → 0b011011
    assert got[0] == 0b011011
    assert got[1] == 0
    # a=65535 → its 16 bits land on even positions
    assert got[2] == sum(1 << (2 * i) for i in range(16))


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    ev = table(spark, SF, "events").withColumn(
        "hour", (F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000).cast("bigint")
    )
    ev = ev.select("event_id", "user_id", "hour", "value")

    linear = str(tmp_path / "by_time")  # the naive layout: sorted by time
    (
        ev.repartitionByRange(8, "hour")
        .sortWithinPartitions("hour")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(ev, zpath, ["user_id", "hour"], n_files=8)

    # identical content, different bytes arrangement
    a = sorted(tuple(r) for r in spark.read.parquet(linear).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(zpath).collect())
    assert a == b

    lin = file_column_ranges(linear, ["user_id", "hour"])
    zor = file_column_ranges(zpath, ["user_id", "hour"])
    assert len(lin) == 8 and len(zor) == 8

    users = [r.user_id for r in ev.select("user_id").distinct().limit(5).collect()]
    lin_user = sum(overlap_fraction(lin, "user_id", u) for u in users) / len(users)
    zor_user = sum(overlap_fraction(zor, "user_id", u) for u in users) / len(users)
    # time-sorted files all span the full user range (no skipping);
    # z-ordered files localize users too
    assert lin_user == 1.0
    assert zor_user <= 0.75

    # and the z-layout still skips on time (the dimension the naive
    # layout optimizes exclusively)
    hours = [r.hour for r in ev.select("hour").distinct().limit(5).collect()]
    zor_hour = sum(overlap_fraction(zor, "hour", h) for h in hours) / len(hours)
    assert zor_hour < 1.0


def test_quantile_buckets_balance_skewed_column(spark):
    """Power-law column: equal-width collapses almost everything into
    bucket 0; quantile buckets spread rows evenly (the pre-ranking
    z-order needs for skewed dimensions)."""
    from databridge_etl_tools_spark.operators.zorder import quantile_buckets

    rows = [(i, int(1.35 ** (i % 40))) for i in range(2000)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    qb = df.select(quantile_buckets(df, "v", n_buckets=8).alias("b"))
    counts = {r["b"]: r["n"] for r in qb.groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert len(counts) >= 6  # nearly every bucket used
    assert max(counts.values()) <= 3 * min(counts.values())  # balanced

    mn, mx = 1, int(1.35 ** 39)
    width = df.select(
        F.least(
            F.width_bucket(F.col("v").cast("double"), F.lit(float(mn)), F.lit(float(mx)), F.lit(8)) - 1,
            F.lit(7),
        ).alias("b")
    )
    wc = {r["b"]: r["n"] for r in width.groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()}
    # equal-width: the bottom bucket hoards the corpus
    assert wc.get(0, 0) > 0.8 * 2000


def test_zorder_quantile_mode_content_identical(spark, tmp_path):
    from databridge_etl_tools_spark.operators.zorder import write_zordered

    ev = table(spark, SF, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "zq")
    write_zordered(ev, path, ["user_id", "value"], n_files=4, normalize="quantile")
    a = sorted(tuple(r) for r in ev.collect())
    b = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert a == b


def test_overlap_fraction_counts_missing_stats_as_hits():
    """A file with no min/max statistics for the column (all-null or
    stats disabled) cannot be skipped — (None, None) ranges must count
    as hits instead of raising TypeError (advisor finding r5)."""
    from databridge_etl_tools_spark.operators.zorder import overlap_fraction

    ranges = [
        {"file": "a", "x": (0, 10)},
        {"file": "b", "x": (None, None)},
        {"file": "c", "x": (20, 30)},
    ]
    assert overlap_fraction(ranges, "x", 5) == 2 / 3   # a + the unknown b
    assert overlap_fraction(ranges, "x", 25) == 2 / 3  # c + b
    assert overlap_fraction(ranges, "x", 99) == 1 / 3  # only b


def test_zorder_quantile_skips_on_powerlaw_column(spark, tmp_path):
    """Measured contrast (round-6 verdict stretch): on a power-law
    column, equal-width normalization collapses most rows into the
    low buckets so the dimension stops contributing to the
    interleave; quantile normalization rebalances it and point
    predicates on the skewed column skip files again. The measured
    fractions are recorded in SCALE.md."""
    docs = table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id",
        F.expr("shiftleft(1L, CAST(n_chars / 35 AS INT))").alias("heavy"),
    )
    wpath, qpath = str(tmp_path / "width"), str(tmp_path / "quantile")
    write_zordered(docs, wpath, ["heavy", "doc_id"], n_files=8, normalize="width")
    write_zordered(docs, qpath, ["heavy", "doc_id"], n_files=8, normalize="quantile")

    # identical content either way
    a = sorted(tuple(r) for r in spark.read.parquet(wpath).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(qpath).collect())
    assert a == b

    wr = file_column_ranges(wpath, ["heavy"])
    qr = file_column_ranges(qpath, ["heavy"])
    assert len(wr) == 8 and len(qr) == 8

    vals = [r.heavy for r in docs.select("heavy").distinct().collect()]
    w_avg = sum(overlap_fraction(wr, "heavy", v) for v in vals) / len(vals)
    q_avg = sum(overlap_fraction(qr, "heavy", v) for v in vals) / len(vals)
    print(f"zorder powerlaw skip: width={w_avg:.3f} quantile={q_avg:.3f}")
    # quantile normalization must strictly improve skipping on the
    # skewed dimension (measured: width 0.90 vs quantile 0.60 — the
    # floor is set by how many rows share each hot power-law value,
    # not by the layout)
    assert q_avg < w_avg
    assert q_avg <= 0.65


def _hilbert_twin(order, x, y):
    # full-order flip (rot(n, ...)): intermediates stay in [0, order)
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = order - 1 - x, order - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_value_matches_twin_bijective_adjacent(spark):
    """The JVM-expression Hilbert index must equal the python twin
    bit-exactly, be a bijection onto [0, 4^bits), and place
    consecutive curve positions in ADJACENT cells — the defining
    property that makes it cluster tighter than Morton."""
    from databridge_etl_tools_spark.operators.zorder import hilbert_value

    bits = 4
    order = 1 << bits
    pts = [(x, y) for x in range(order) for y in range(order)]
    df = spark.createDataFrame(pts, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select("x", "y", hilbert_value("x", "y", bits=bits).alias("d")).collect()
    }
    assert got == {(x, y): _hilbert_twin(order, x, y) for x, y in pts}
    inv = {d: xy for xy, d in got.items()}
    assert sorted(inv) == list(range(order * order))
    assert all(
        abs(inv[i][0] - inv[i + 1][0]) + abs(inv[i][1] - inv[i + 1][1]) == 1
        for i in range(order * order - 1)
    )


def test_hilbert_layout_not_worse_than_morton_and_content_identical(spark, tmp_path):
    """curve='hilbert' must serve identical rows and skip at least
    comparably to Morton on the planted 2-D workload (the adjacency
    property tightens per-file boxes; measured, not asserted blindly
    — we allow a small tolerance since 8 files over a small grid is
    a coarse measurement)."""
    ev = table(spark, SF, "events").withColumn(
        "hour",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000).cast("bigint"),
    )
    ev = ev.select("event_id", "user_id", "hour", "value")
    mpath, hpath = str(tmp_path / "morton"), str(tmp_path / "hilbert")
    write_zordered(ev, mpath, ["user_id", "hour"], n_files=8)
    write_zordered(ev, hpath, ["user_id", "hour"], n_files=8, curve="hilbert")
    a = sorted(tuple(r) for r in spark.read.parquet(mpath).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(hpath).collect())
    assert a == b
    mor = file_column_ranges(mpath, ["user_id", "hour"])
    hil = file_column_ranges(hpath, ["user_id", "hour"])
    users = [r.user_id for r in ev.select("user_id").distinct().limit(5).collect()]
    hours = [r.hour for r in ev.select("hour").distinct().limit(5).collect()]

    def score(ranges):
        u = sum(overlap_fraction(ranges, "user_id", x) for x in users) / len(users)
        h = sum(overlap_fraction(ranges, "hour", x) for x in hours) / len(hours)
        return u + h

    assert score(hil) <= score(mor) + 0.15
    assert score(hil) < 2.0  # skips SOMETHING on the combined workload
    import pytest as _pytest

    # d > 2 is now the Skilling path (r8); a single column still has
    # no curve to follow
    with _pytest.raises(ValueError, match=">= 2"):
        write_zordered(ev, str(tmp_path / "bad"), ["user_id"], curve="hilbert")


def test_hilbert_nd_matches_twin_bijective_adjacent(spark):
    """The d-dimensional Skilling fold must equal its python twin
    bit-exactly for d = 2, 3, 4, and the twin itself must be a
    bijection with unit-step adjacency — the property that makes
    Hilbert clustering worth it over Morton in ANY dimension."""
    import itertools

    from databridge_etl_tools_spark.operators.zorder import (
        hilbert_index_nd_py,
        hilbert_value_nd,
    )

    for d, bits in [(2, 3), (3, 2), (4, 2)]:
        order = 1 << bits
        pts = list(itertools.product(range(order), repeat=d))
        exp = {p: hilbert_index_nd_py(list(p), bits) for p in pts}
        inv = {h: p for p, h in exp.items()}
        assert sorted(inv) == list(range(order**d)), (d, bits)
        assert all(
            sum(abs(a - b) for a, b in zip(inv[i], inv[i + 1])) == 1
            for i in range(order**d - 1)
        ), (d, bits)
        cols = [f"c{i}" for i in range(d)]
        df = spark.createDataFrame(
            pts, ", ".join(f"{c} bigint" for c in cols)
        )
        got = {
            tuple(r[c] for c in cols): r["h"]
            for r in df.select(
                *cols, hilbert_value_nd(cols, bits=bits).alias("h")
            ).collect()
        }
        assert got == exp, (d, bits)


def test_hilbert_nd_layout_3col_content_identical_and_skips(spark, tmp_path):
    """3-column curve='hilbert' (the d>2 path Skilling unlocked) must
    serve identical rows to Morton and skip comparably on a 3-D
    workload."""
    ev = table(spark, SF, "events").withColumn(
        "hour",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000).cast(
            "bigint"
        ),
    )
    ev = ev.where(F.col("user_id").isNotNull() & F.col("value").isNotNull())
    ev = ev.select(
        "event_id", "user_id", "hour", (F.col("value") * 100).cast("bigint").alias("cents")
    )
    mpath, hpath = str(tmp_path / "m3"), str(tmp_path / "h3")
    write_zordered(ev, mpath, ["user_id", "hour", "cents"], n_files=8)
    write_zordered(
        ev, hpath, ["user_id", "hour", "cents"], n_files=8, curve="hilbert"
    )
    a = sorted(tuple(r) for r in spark.read.parquet(mpath).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(hpath).collect())
    assert a == b
    # both layouts must actually skip: a point probe on each column
    # touches a strict subset of files
    for path in (mpath, hpath):
        ranges = file_column_ranges(path, ["user_id", "hour", "cents"])
        assert len(ranges) > 1
        probe = a[len(a) // 2]
        for col, val in [("user_id", probe[1]), ("hour", probe[2])]:
            assert overlap_fraction(ranges, col, val) < 1.0
