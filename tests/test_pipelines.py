"""End-to-end pipeline tests reproducing the reference's round-trip
oracle (tests/test_postgres.py:70-93): load a fixture CSV modeled on
point_table_2272 (empty geometry, NULLs, special characters, QNAN
Z-coords), extract it, load it back, assert recorddiff is empty."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databridge_etl_tools_spark.plans import pipelines as P
from databridge_etl_tools_spark.qa import QAError, QAReport
from databridge_etl_tools_spark.schema import TableSchema
from databridge_etl_tools_spark.sources.csv_io import read_csv
from databridge_etl_tools_spark.sources.table_store import TableStore

SCHEMA = TableSchema.from_json(
    {
        "primaryKey": ["objectid"],
        "fields": [
            {"name": "objectid", "type": "integer", "constraints": {"required": True}},
            {"name": "textfield", "type": "string"},
            {"name": "datefield", "type": "datetime"},
            {"name": "numericfield", "type": "numeric"},
            {"name": "shape", "type": "geometry", "geometry_type": "point", "srid": 2272},
        ],
    }
)

CSV = """objectid,textfield,datefield,numericfield,shape
1,,,,SRID=2272;MULTIPOINT EMPTY
2,ab#$%c,2019-05-14 09:06:07,12.54,SRID=2272;POINT(2712205.71100539 259685.27615705)
3,"d!@^&*?-=+ef",2019-05-14 09:06:07,9.99,SRID=2272;POINT(2712205.71 259685.27)
4,"quoted, comma",2020-01-01 00:00:00,-1.5,SRID=2272;POINT Z (2712205.71 259685.27 1.#QNAN000)
5,unicode-é,2020-06-01 12:30:00,0,SRID=2272;POINT(0 0)
"""


@pytest.fixture()
def staged_csv(tmp_path):
    p = tmp_path / "staging" / "point_table.csv"
    p.parent.mkdir(parents=True)
    p.write_text(CSV, encoding="utf-8")
    return str(p)


def test_load_extract_roundtrip(spark, tmp_path, staged_csv):
    store = TableStore(spark, str(tmp_path / "wh"))
    res = P.load_pipeline(spark, staged_csv, SCHEMA, store, "point_table", mode="truncate")
    assert res.rows_loaded == 5
    loaded = store.read("point_table")
    assert loaded.count() == 5

    rows = {r.objectid: r for r in loaded.collect()}
    # QNAN Z-coordinate repaired and flattened to 2D
    assert rows[4].shape == "SRID=2272;POINT (2712205.71 259685.27)"
    # empty geometry preserved
    assert rows[1].shape == "SRID=2272;MULTIPOINT EMPTY"
    # typed columns
    assert str(rows[2].numericfield) == "12.54000000"
    assert rows[2].datefield.year == 2019

    # extract to CSV + schema sidecar
    out = str(tmp_path / "extract_out")
    eres = P.extract_pipeline(spark, store, "point_table", out, localize_timestamps=False)
    assert eres.rows == 5
    assert '"primaryKey"' in eres.schema_json

    # round-trip: load the extracted CSV into a second table → no diff
    res2 = P.load_pipeline(spark, out, SCHEMA, store, "point_table_rt", mode="truncate")
    assert res2.rows_loaded == 5
    a, b = store.read("point_table"), store.read("point_table_rt")
    qa = QAReport()
    qa.record_diff_empty(a, b)
    qa.raise_if_failed()


def test_extract_localizes_timestamps(spark, tmp_path, staged_csv):
    store = TableStore(spark, str(tmp_path / "wh"))
    P.load_pipeline(spark, staged_csv, SCHEMA, store, "pt", mode="truncate")
    out = str(tmp_path / "loc_out")
    P.extract_pipeline(spark, store, "pt", out, localize_timestamps=True)
    back = read_csv(spark, out)
    vals = {r.objectid: r.datefield for r in back.collect()}
    assert vals["2"] == "2019-05-14 09:06:07-04:00"  # EDT
    assert vals["4"] == "2020-01-01 00:00:00-05:00"  # EST


def test_load_append_mode_accumulates(spark, tmp_path, staged_csv):
    store = TableStore(spark, str(tmp_path / "wh"))
    P.load_pipeline(spark, staged_csv, SCHEMA, store, "pt", mode="truncate")
    P.load_pipeline(spark, staged_csv, SCHEMA, store, "pt", mode="append")
    assert store.read("pt").count() == 10


def test_load_field_mismatch_fails_before_write(spark, tmp_path):
    bad = tmp_path / "bad.csv"
    bad.write_text("objectid,unknown_col\n1,x\n")
    store = TableStore(spark, str(tmp_path / "wh"))
    with pytest.raises(QAError) as ei:
        P.load_pipeline(spark, str(bad), SCHEMA, store, "pt_bad", mode="truncate")
    assert "V5" in str(ei.value)
    # QA preconditions run before ANY store mutation: no table created
    assert not store.exists("pt_bad")


def test_geometry_precheck_blocks_wrong_kind(spark, tmp_path):
    wrong = tmp_path / "wrong_geom.csv"
    wrong.write_text(
        "objectid,textfield,datefield,numericfield,shape\n"
        "1,a,2020-01-01 00:00:00,1,SRID=2272;LINESTRING(0 0, 1 1)\n"
    )
    store = TableStore(spark, str(tmp_path / "wh"))
    with pytest.raises(QAError) as ei:
        P.load_pipeline(spark, str(wrong), SCHEMA, store, "pt_geom", mode="truncate")
    assert "V6" in str(ei.value)


def test_upsert_pipeline_updates_and_inserts(spark, tmp_path, staged_csv):
    store = TableStore(spark, str(tmp_path / "wh"))
    P.load_pipeline(spark, staged_csv, SCHEMA, store, "pt", mode="truncate")
    delta = tmp_path / "delta.csv"
    delta.write_text(
        "objectid,textfield,datefield,numericfield,shape\n"
        "2,UPDATED,2021-01-01 00:00:00,99.9,SRID=2272;POINT(1 1)\n"
        "6,NEW,2021-01-01 00:00:00,1,SRID=2272;POINT(2 2)\n"
    )
    res = P.upsert_pipeline(spark, str(delta), SCHEMA, store, "pt")
    assert res.final_count == 6
    rows = {r.objectid: r for r in store.read("pt").collect()}
    assert rows[2].textfield == "UPDATED"
    assert rows[6].textfield == "NEW"
    assert rows[1].shape == "SRID=2272;MULTIPOINT EMPTY"  # untouched


def test_upsert_delete_stale(spark, tmp_path, staged_csv):
    store = TableStore(spark, str(tmp_path / "wh"))
    P.load_pipeline(spark, staged_csv, SCHEMA, store, "pt", mode="truncate")
    delta = tmp_path / "delta.csv"
    delta.write_text(
        "objectid,textfield,datefield,numericfield,shape\n"
        "2,KEEP,2021-01-01 00:00:00,1,SRID=2272;POINT(1 1)\n"
        "3,KEEP,2021-01-01 00:00:00,1,SRID=2272;POINT(1 1)\n"
    )
    res = P.upsert_pipeline(spark, str(delta), SCHEMA, store, "pt", delete_stale_rows=True)
    assert res.final_count == 2
    assert {r.objectid for r in store.read("pt").collect()} == {2, 3}


def test_geometry_precheck_catches_truncated_wkt(spark, tmp_path):
    # an unquoted comma inside the WKT cell truncates it at CSV parse
    # time — V6 must block the load (structural parens check)
    bad = tmp_path / "trunc.csv"
    bad.write_text(
        "objectid,textfield,datefield,numericfield,shape\n"
        "1,a,2020-01-01 00:00:00,1,SRID=2272;POINT(1\n"
    )
    store = TableStore(spark, str(tmp_path / "wh"))
    with pytest.raises(QAError) as ei:
        P.load_pipeline(spark, str(bad), SCHEMA, store, "pt_trunc", mode="truncate")
    assert "V6" in str(ei.value)


def test_publish_opendata_reprojects_and_gzips(spark, tmp_path, staged_csv):
    import glob

    store = TableStore(spark, str(tmp_path / "wh"))
    P.load_pipeline(spark, staged_csv, SCHEMA, store, "pt", mode="truncate")
    out = str(tmp_path / "pub")
    P.publish_opendata(spark, store, "pt", out)
    back = read_csv(spark, out)
    assert "shape" not in back.columns
    rows = {r.objectid: r for r in back.collect()}
    # 2272 fixture points land in/near Philadelphia after reprojection
    lng, lat = float(rows["2"].lng), float(rows["2"].lat)
    assert -75.5 < lng < -74.8 and 39.8 < lat < 40.2
    # empty geometry row → null lat/lng
    assert rows["1"].lng is None
    assert glob.glob(out + "_gz/*.csv.gz")


def test_load_rename_replace_recreates_on_drift(spark, tmp_path, staged_csv):
    store = TableStore(spark, str(tmp_path / "wh"))
    P.load_pipeline(spark, staged_csv, SCHEMA, store, "pt", mode="truncate")
    # drifted schema (extra column) → rename_replace drops + recreates
    drifted = TableSchema.from_json(
        {
            "primaryKey": ["objectid"],
            "fields": [
                {"name": "objectid", "type": "integer", "constraints": {"required": True}},
                {"name": "textfield", "type": "string"},
                {"name": "datefield", "type": "datetime"},
                {"name": "numericfield", "type": "numeric"},
                {"name": "extra", "type": "string"},
                {"name": "shape", "type": "geometry", "geometry_type": "point", "srid": 2272},
            ],
        }
    )
    csv2 = tmp_path / "staging2.csv"
    csv2.write_text(
        "objectid,textfield,datefield,numericfield,extra,shape\n"
        "9,x,2022-01-01 00:00:00,1,e,SRID=2272;POINT(1 2)\n"
    )
    res = P.load_pipeline(spark, str(csv2), drifted, store, "pt", mode="rename_replace")
    assert res.recreated is True
    out = store.read("pt")
    assert "extra" in out.columns and out.count() == 1


def test_drift_recreate_blocked_by_failing_precheck(spark, tmp_path, staged_csv):
    # the severe case from review: drifted schema + malformed geometry
    # must NOT drop existing data (QA precedes the drift drop)
    store = TableStore(spark, str(tmp_path / "wh"))
    P.load_pipeline(spark, staged_csv, SCHEMA, store, "pt", mode="truncate")
    assert store.read("pt").count() == 5

    drifted = TableSchema.from_json(
        {
            "primaryKey": ["objectid"],
            "fields": [
                {"name": "objectid", "type": "integer", "constraints": {"required": True}},
                {"name": "shape", "type": "geometry", "geometry_type": "point", "srid": 2272},
            ],
        }
    )
    bad = tmp_path / "bad_geom.csv"
    bad.write_text("objectid,shape\n1,SRID=2272;POINT(1\n")
    with pytest.raises(QAError):
        P.load_pipeline(spark, str(bad), drifted, store, "pt", mode="rename_replace")
    # prior data fully intact — no drop/recreate happened
    assert store.read("pt").count() == 5
    assert "textfield" in store.read("pt").columns


def test_upsert_synthesizes_objectid_with_oid_swap(spark, tmp_path):
    # PK is textfield-like 'code'; objectid is DB-managed: matched
    # rows keep their objectid, new rows continue past max(existing)
    schema = TableSchema.from_json(
        {
            "primaryKey": ["code"],
            "fields": [
                {"name": "objectid", "type": "integer"},
                {"name": "code", "type": "string", "constraints": {"required": True}},
                {"name": "val", "type": "integer"},
            ],
        }
    )
    store = TableStore(spark, str(tmp_path / "wh"))
    base = tmp_path / "base.csv"
    base.write_text("objectid,code,val\n10,a,1\n20,b,2\n")
    P.load_pipeline(spark, str(base), schema, store, "t", mode="truncate")

    delta = tmp_path / "delta.csv"
    delta.write_text("code,val\nb,99\nc,3\n")  # no objectid column
    P.upsert_pipeline(spark, str(delta), schema, store, "t")
    rows = {r.code: r for r in store.read("t").collect()}
    assert rows["b"].objectid == 20 and rows["b"].val == 99  # oid kept
    assert rows["a"].objectid == 10 and rows["a"].val == 1
    assert rows["c"].objectid > 20 and rows["c"].val == 3  # fresh id


def test_dense_ids_no_global_sort(spark):
    from databridge_etl_tools_spark.operators.util import dense_ids

    df = spark.range(0, 1000, 1, 8).selectExpr("id AS payload")
    out = dense_ids(df, base=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole point: no single-partition Exchange, no global Sort
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan.lower()
    ids = sorted(r.objectid for r in out.collect())
    assert ids == list(range(101, 1101))  # dense, continuous, offset by base
    assert out.rdd.getNumPartitions() == 8
