"""REST source/sink tests against the local stub server."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from databridge_etl_tools_spark.sinks.rest_sink import (
    ago_upsert_plan,
    post_batches,
    quarantine_failures,
)
from databridge_etl_tools_spark.sources.geocode import geocode_enrich
from databridge_etl_tools_spark.sources.rest import (
    AGOFeatureSource,
    AirtableSource,
    KnackSource,
)

from rest_stub import Handler, start_stub


@pytest.fixture(scope="module")
def stub():
    srv, url = start_stub()
    yield url
    srv.shutdown()


def test_knack_schema_and_extract(spark, stub):
    import datetime as dt
    from decimal import Decimal

    src = KnackSource(stub, rows_per_page=10)
    schema = src.schema("obj_1")
    assert [f.name for f in schema.fields] == [
        "id", "record_id", "date_opened", "status", "amount",
    ]
    assert schema["record_id"].dataType == T.LongType()
    assert schema["amount"].dataType == T.DecimalType(38, 8)
    df = src.extract(spark, "obj_1", schema)
    assert df.count() == 25  # 3 pages of 10
    row = df.where(F.col("record_id") == 1).first()
    # dict cells JSON-serialized; number coerced to Decimal; ISO
    # date_time string parsed into TIMESTAMP_NTZ
    assert row["status"] == '{"v": 1}'
    assert row["amount"] == Decimal("1.50000000")
    assert row["date_opened"] == dt.datetime(2024, 3, 2, 9, 30)
    assert df.where(F.col("record_id") == 0).first()["date_opened"] is None


def test_airtable_offset_pagination_and_objectid(spark, stub):
    schema = T.StructType(
        [T.StructField("name", T.StringType()), T.StructField("value", T.LongType())]
    )
    src = AirtableSource(f"{stub}", rows_per_page=12)
    df = src.extract(spark, "airtable", schema, add_objectid=True)
    assert df.count() == 30
    assert df.select("objectid").distinct().count() == 30


def test_ago_count_extract_and_partitioned(spark, stub):
    schema = T.StructType(
        [
            T.StructField("objectid", T.LongType()),
            T.StructField("pk", T.StringType()),
            T.StructField("val", T.LongType()),
        ]
    )
    src = AGOFeatureSource(stub, batch=7)
    assert src.count() == 20
    df = src.extract(spark, schema)
    assert df.count() == 20
    dfp = src.extract_partitioned(spark, schema, "objectid", [(0, 10), (10, 30)])
    assert dfp.count() == 20
    assert set(r.objectid for r in dfp.collect()) == set(range(20))


def test_post_batches_and_quarantine(spark, stub, tmp_path):
    Handler.posted.clear()
    df = spark.range(0, 23).withColumn("v", F.col("id") * 2).repartition(2)
    status = post_batches(df, f"{stub}/edits", batch_size=10).cache()
    rows = status.collect()
    assert sum(r.n_rows for r in rows) == 23
    assert all(r.ok for r in rows)
    assert sum(len(d["rows"]) for d in Handler.posted) == 23
    assert quarantine_failures(status, str(tmp_path / "errs")) == 0


def test_post_batches_transient_retry(spark, stub):
    Handler.posted.clear()
    # every first POST of batch id '<pid>-0' fails once, then succeeds
    Handler.fail_batches = {f"{p}-0" for p in range(4)}
    df = spark.range(0, 8).repartition(1)
    status = post_batches(df, f"{stub}/edits", batch_size=100).collect()
    assert all(r.ok for r in status)


def test_ago_upsert_plan_splits(spark):
    existing = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "b", 30)], "objectid int, pk string, val int"
    )
    staged = spark.createDataFrame(
        [(99, "a", 11), (98, "c", 12)], "objectid int, pk string, val int"
    )
    adds, updates, dups = ago_upsert_plan(staged, existing, "pk")
    assert [(r.pk, r.val) for r in adds.collect()] == [("c", 12)]
    urow = updates.first()
    assert urow.pk == "a" and urow.objectid == 1  # existing oid swapped in
    assert [(r.objectid, r.pk) for r in dups.collect()] == [(3, "b")]


def test_geocode_enrich_hit_and_miss(spark, stub):
    df = spark.createDataFrame(
        [(1, "100 Market St"), (2, "bad address zzz")], "id int, addr string"
    )
    out = geocode_enrich(df, "addr", stub).collect()
    by_id = {r.id: r for r in out}
    assert by_id[1].geocoded and by_id[1].lat == "39.95"
    assert by_id[1].normalized == "100 MARKET ST"
    assert not by_id[2].geocoded and by_id[2].lat is None


def test_post_batches_permanent_failure_quarantined(spark, stub, tmp_path):
    df = spark.range(0, 5).repartition(1)
    import databridge_etl_tools_spark.sinks.rest_sink as RS

    status = RS.post_batches(
        df.withColumnRenamed("id", "v"),
        f"{stub}/always-fail",  # stub 500s every attempt
        batch_size=100,
        retries=2,
    ).cache()
    rows = status.collect()
    assert len(rows) == 1 and not rows[0].ok
    assert rows[0].payload_sample is not None  # sample preserved for replay
    n = RS.quarantine_failures(status, str(tmp_path / "errs"))
    assert n == 1
    back = spark.read.json(str(tmp_path / "errs"))
    assert back.count() == 1 and back.first().n_rows == 1 * 5


def test_ago_server_capped_pages_still_complete(spark, stub):
    # client asks for 15/page; stub's maxRecordCount is 9 and sets
    # exceededTransferLimit — pagination must continue to all 20 rows
    schema = T.StructType(
        [
            T.StructField("objectid", T.LongType()),
            T.StructField("pk", T.StringType()),
            T.StructField("val", T.LongType()),
        ]
    )
    src = AGOFeatureSource(stub, batch=15)
    df = src.extract(spark, schema)
    assert df.count() == 20


def test_python_datasource_executor_side_with_pushdown(spark, stub):
    """Spark 4 Python Data Source API: range-partitioned executor-side
    fetch with filter pushdown into the service's where parameter."""
    from databridge_etl_tools_spark.sources.feature_service_ds import (
        FeatureServiceDataSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FeatureServiceDataSource)
    reader = (
        spark.read.format("feature_service")
        .schema("objectid bigint, pk string, val bigint")
        .option("url", stub)
        .option("id_col", "objectid")
        .option("lower", 0)
        .option("upper", 20)
        .option("num_partitions", 4)
        .option("batch", 50)
    )

    df = reader.load()
    assert df.count() == 20
    assert set(r.objectid for r in df.collect()) == set(range(20))

    # filter pushdown: the pk predicate must reach the service
    Handler.feature_queries.clear()
    filtered = reader.load().where(F.col("pk") == "p3")
    rows = filtered.collect()
    assert {r.objectid for r in rows} == {3, 11, 19}
    wheres = [q["where"] for q in Handler.feature_queries]
    assert any("pk = 'p3'" in w for w in wheres), wheres


def test_knack_datasource_executor_side_pages(spark, stub):
    """Knack's numbered pages fan out across executors: the planner
    probes total_pages once, then each InputPartition fetches its own
    page range worker-side — same result as the driver-side cursor."""
    from databridge_etl_tools_spark.sources.knack_ds import KnackDataSource

    spark.dataSource.register(KnackDataSource)
    src = KnackSource(stub, rows_per_page=10)
    schema = src.schema("obj_1")
    expected = {tuple(r) for r in src.extract(spark, "obj_1", schema).collect()}

    df = (
        spark.read.format("knack")
        .schema(schema)
        .option("url", stub)
        .option("object", "obj_1")
        .option("rows_per_page", 10)
        .option("num_partitions", 3)
        .load()
    )
    # 25 records / 10 per page = 3 pages → one partition per page
    assert df.rdd.getNumPartitions() == 3
    assert {tuple(r) for r in df.collect()} == expected
    assert len(expected) == 25


def test_airtable_datasource_executor_side_cursor(spark, stub):
    """Airtable's opaque offset cursor walks on an EXECUTOR: one
    InputPartition follows the chain worker-side, the driver transfers
    no records — same rows as the driver-cursor AirtableSource."""
    from databridge_etl_tools_spark.sources.airtable_ds import AirtableDataSource

    spark.dataSource.register(AirtableDataSource)
    schema = T.StructType(
        [T.StructField("name", T.StringType()), T.StructField("value", T.LongType())]
    )
    expected = {
        tuple(r)
        for r in AirtableSource(stub, rows_per_page=12)
        .extract(spark, "airtable", schema)
        .collect()
    }
    df = (
        spark.read.format("airtable")
        .schema(schema)
        .option("url", stub)
        .option("table", "airtable")
        .option("page_size", 12)
        .load()
    )
    assert df.rdd.getNumPartitions() == 1  # cursor chain is API-serial
    assert {tuple(r) for r in df.collect()} == expected
    assert len(expected) == 30


def test_knack_stream_incremental_extract(spark, stub, tmp_path):
    """Streaming Knack source: record-count offsets checkpoint across
    runs — a drained stream re-run pulls nothing; after the object
    grows, the next run pulls ONLY the delta, fetched executor-side in
    page-range partitions (the reference's recurring full-table pull,
    re-expressed as an exactly-once incremental source)."""
    import rest_stub
    from databridge_etl_tools_spark.sources.knack_stream_ds import (
        KnackStreamDataSource,
    )

    spark.dataSource.register(KnackStreamDataSource)
    src = KnackSource(stub, rows_per_page=10)
    schema = src.schema("obj_1")
    ckpt = str(tmp_path / "knack_ckpt")

    def drain():
        got: list[int] = []

        def handle(batch_df, _eid):
            got.extend(r.record_id for r in batch_df.select("record_id").collect())

        q = (
            spark.readStream.format("knack_stream")
            .schema(schema)
            .option("url", stub)
            .option("object", "obj_1")
            .option("rows_per_page", 10)
            .load()
            .writeStream.outputMode("append")
            .foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    assert set(drain()) == set(range(25))
    assert drain() == []  # offset persisted in the checkpoint: nothing new

    grown = [
        {"id": f"k{i}", "record_id": i, "date_opened": None,
         "status": {"v": 0}, "amount": i * 1.5}
        for i in range(25, 32)
    ]
    rest_stub.KNACK_RECORDS.extend(grown)
    try:
        assert set(drain()) == set(range(25, 32))  # only the delta
    finally:
        del rest_stub.KNACK_RECORDS[25:]


def test_rest_to_store_to_csv_integration(spark, stub, tmp_path):
    """Cross-component flow: REST extract -> TableStore load ->
    extract pipeline CSV + schema sidecar (the reference's Knack
    extract-then-load composition, end to end)."""
    import json as _json

    from databridge_etl_tools_spark.plans.pipelines import extract_pipeline
    from databridge_etl_tools_spark.schema import TableSchema
    from databridge_etl_tools_spark.sources.table_store import TableStore

    src = KnackSource(stub, rows_per_page=10)
    schema = src.schema("obj_1")
    df = src.extract(spark, "obj_1", schema)

    store = TableStore(spark, str(tmp_path / "wh"))
    store.create_table("knack_obj", TableSchema(struct=schema, primary_key=["id"]))
    store.append("knack_obj", df)
    assert store.read("knack_obj").count() == 25

    out = str(tmp_path / "knack_csv")
    res = extract_pipeline(spark, store, "knack_obj", out, localize_timestamps=False)
    assert res.rows == 25
    sidecar = _json.loads(res.schema_json)
    assert sidecar["primaryKey"] == ["id"]
    assert {f["name"] for f in sidecar["fields"]} == {
        "id", "record_id", "date_opened", "status", "amount",
    }


def test_post_batches_refuses_task_retries():
    from databridge_etl_tools_spark.sinks.rest_sink import _check_task_retries

    # cluster masters retry by default → refuse
    with pytest.raises(RuntimeError, match="maxFailures=4"):
        _check_task_retries(None, "yarn", allow_task_retries=False)
    with pytest.raises(RuntimeError, match="maxFailures=3"):
        _check_task_retries("3", "local[8]", allow_task_retries=False)
    # explicit opt-outs pass: retries disabled, local-no-retry master,
    # or the caller owns dedupe on batch_id
    _check_task_retries("1", "yarn", allow_task_retries=False)
    _check_task_retries(None, "local[32]", allow_task_retries=False)
    _check_task_retries(None, "local[8,4]", allow_task_retries=True)
