"""CSV encoding-fallback tests (S2: utf-8 → latin-1 retry)."""

from __future__ import annotations

from databridge_etl_tools_spark.sources.csv_io import read_csv


def test_latin1_file_falls_back(spark, tmp_path):
    p = tmp_path / "latin.csv"
    # 'café' in latin-1: 0xE9 is not valid UTF-8 → U+FFFD under utf-8
    p.write_bytes(b"id,name\n1,caf\xe9\n2,plain\n")
    df = read_csv(spark, str(p))
    names = {r.id: r.name for r in df.collect()}
    assert names["1"] == "café"  # decoded via the latin-1 retry
    assert names["2"] == "plain"


def test_utf8_file_reads_directly(spark, tmp_path):
    p = tmp_path / "utf8.csv"
    p.write_text("id,name\n1,café\n", encoding="utf-8")
    df = read_csv(spark, str(p))
    assert df.first().name == "café"


def test_huge_cell_tolerated(spark, tmp_path):
    # csv.field_size_limit(sys.maxsize) parity: a 2MB WKT-ish cell
    p = tmp_path / "huge.csv"
    big = "POLYGON((" + ",".join(f"{i} {i}" for i in range(150_000)) + "))"
    p.write_text(f"id,shape\n1,\"{big}\"\n", encoding="utf-8")
    df = read_csv(spark, str(p))
    row = df.first()
    assert len(row.shape) == len(big)
