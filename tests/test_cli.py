"""CLI surface tests (in-process main(), reusing the test session)."""

from __future__ import annotations

import json

from databridge_etl_tools_spark.cli import main

SCHEMA = {
    "primaryKey": ["objectid"],
    "fields": [
        {"name": "objectid", "type": "integer", "constraints": {"required": True}},
        {"name": "textfield", "type": "string"},
        {"name": "shape", "type": "geometry", "geometry_type": "polygon", "srid": 2272},
    ],
}


def test_cli_load_upsert_extract(spark, tmp_path, capsys):
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps(SCHEMA))
    csv = tmp_path / "in.csv"
    csv.write_text(
        "objectid,textfield,shape\n"
        '1,a,"SRID=2272;POLYGON((0 0,1 0,1 1,0 0))"\n'
        "2,b,SRID=2272;POLYGON EMPTY\n"
    )
    delta = tmp_path / "delta.csv"
    delta.write_text(
        "objectid,textfield,shape\n"
        '2,UPDATED,"SRID=2272;POLYGON((5 5,6 5,6 6,5 5))"\n'
        '3,NEW,"SRID=2272;POLYGON((9 9,9 8,8 8,9 9))"\n'
    )
    store = str(tmp_path / "wh")

    assert main(["table", "load", "--store", store, "--table", "poly",
                 "--csv", str(csv), "--schema", str(schema_file)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"rows_loaded": 2, "recreated": True}

    assert main(["table", "upsert", "--store", store, "--table", "poly",
                 "--csv", str(delta), "--schema", str(schema_file)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["final_count"] == 3

    out_dir = str(tmp_path / "out_csv")
    assert main(["table", "extract", "--store", store, "--table", "poly",
                 "--out", out_dir]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == 3
    sidecar = json.loads((tmp_path / "out_csv.schema.json").read_text())
    assert sidecar["primaryKey"] == ["objectid"]


def test_cli_query_list_and_run(spark, capsys):
    assert main(["query", "list"]) == 0
    names = capsys.readouterr().out.split()
    assert "pricing_summary" in names and len(names) >= 50

    assert main(["query", "run", "--name", "scan_probes",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows[0]["max_orderkey"] == 1499


def test_cli_maintain_and_layout(spark, tmp_path, capsys):
    from databridge_etl_tools_spark import registry
    from databridge_etl_tools_spark.sources.table_store import TableStore

    # seed a table with fragmented segments via incremental appends
    store = TableStore(spark, str(tmp_path / "wh"))
    store.overwrite("t", spark.range(100).toDF("id"))
    store.append("t", spark.range(100, 150).toDF("id"))
    rc = main(
        ["table", "maintain", "--store", str(tmp_path / "wh"), "--table", "t"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["partitions"] >= 1 and len(out["vacuumed"]) >= 2
    assert store.read("t").count() == 150

    # layout build via CLI, then a query served from the layouts
    try:
        rc = main(
            ["layout", "build", "--sf-dir", "/root/testdata/sf0.001",
             "--out-dir", str(tmp_path / "lay")]
        )
        assert rc == 0
        capsys.readouterr()
        rc = main(
            ["query", "run", "--name", "region_revenue",
             "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]
        )
        assert rc == 0
        rows = json.loads(capsys.readouterr().out)
        assert len(rows) == 3 and "revenue" in rows[0]
    finally:
        for tbl in ("lineitem", "orders"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}_bkt_root_testdata_sf0_001")
        registry.clear_layouts()


def test_cli_query_explain(spark, capsys):
    from databridge_etl_tools_spark.cli import main

    rc = main(
        [
            "query", "explain", "--name", "pricing_summary",
            "--sf-dir", "/root/testdata/sf0.001", "--mode", "formatted",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "Physical Plan" in out
    assert "HashAggregate" in out


def test_cli_table_history_and_restore(spark, tmp_path, capsys):
    from databridge_etl_tools_spark.cli import main
    from databridge_etl_tools_spark.sources.table_store import TableStore

    root = str(tmp_path / "clistore")
    store = TableStore(spark, root)
    df1 = spark.createDataFrame([(1, "old")], "k long, v string")
    store.create_table("t", df1.schema)
    store.overwrite("t", df1)
    store.overwrite("t", spark.createDataFrame([(1, "new")], "k long, v string"))

    assert main(["table", "history", "--store", root, "--table", "t"]) == 0
    log = json.loads(capsys.readouterr().out)
    assert len(log) == 3

    assert main(["table", "restore", "--store", root, "--table", "t",
                 "--commit", "1"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["rows"] == 1
    assert [r.v for r in store.read("t").collect()] == ["old"]


def test_cli_layout_zorder(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "zo")
    assert main([
        "layout", "zorder",
        "--input", "/root/testdata/sf0.001/events.parquet",
        "--out", out_dir, "--cols", "user_id,value", "--files", "4",
        "--normalize", "quantile",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["cols"] == ["user_id", "value"] and out["files"] == 4
    n = spark.read.parquet(out_dir).count()
    assert n == spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
