"""AGO addToDefinition index choreography against the local stub
(reference: ago/ago.py:932-1079), and Carto grant/privacy semantics
on the TableStore (carto/carto_.py:417-427, 461-492)."""

from __future__ import annotations

import pytest

from rest_stub import Handler, start_stub

from databridge_etl_tools_spark.sinks.ago_admin import AGOIndexAdmin
from databridge_etl_tools_spark.sources.table_store import TableStore


@pytest.fixture()
def stub():
    srv, url = start_stub()
    Handler.ago_indexes = []
    Handler.ago_error_queue = []
    Handler.ago_hidden_indexes = set()
    yield url
    srv.shutdown()


def admin(url):
    return AGOIndexAdmin(
        url, layer=0, token="t",
        inter_post_wait=0.0, retry_wait=0.0, settle_wait=0.0,
    )


def test_post_simple_and_composite_with_uniqueness(stub):
    schema_fields = [{"name": "objectid", "unique": True}, {"name": "status"}]
    rep = admin(stub).post_index_fields("objectid,status,addr+zip", schema_fields)
    assert rep.posted == ["objectid_idx", "status_idx", "addr_zip_idx"]
    assert rep.missing_after_settle == []
    by_name = {i["name"]: i for i in Handler.ago_indexes}
    assert by_name["objectid_idx"]["isUnique"] is True
    assert by_name["status_idx"]["isUnique"] is False
    # composite '+' spec becomes the multi-field definition
    assert by_name["addr_zip_idx"]["fields"] == "addr,zip"


def test_invalid_definition_means_already_present(stub):
    Handler.ago_error_queue = ["Error: Invalid definition for the layer"]
    rep = admin(stub).post_index_fields("objectid")
    assert rep.already_present == ["objectid_idx"]
    # never accepted by the service, so the settle-check re-posts it
    assert rep.missing_after_settle == ["objectid_idx"]
    assert rep.reposted == ["objectid_idx"]
    assert {i["name"] for i in Handler.ago_indexes} == {"objectid_idx"}


def test_invalid_url_raises(stub):
    Handler.ago_error_queue = ["Invalid URL"]
    with pytest.raises(ValueError, match="service name"):
        admin(stub).post_index_fields("objectid")


def test_retriable_errors_retry_once_then_succeed(stub):
    Handler.ago_error_queue = [
        "Operation failed. The index entry of length 9000 exceeds",
    ]
    rep = admin(stub).post_index_fields("objectid")
    assert rep.retried == ["objectid_idx"]
    assert rep.retry_failed == []
    assert {i["name"] for i in Handler.ago_indexes} == {"objectid_idx"}


def test_settle_check_reposts_underreported_indexes(stub):
    # AGO accepts both indexes but under-reports one in the layer
    # definition exactly once (the reference's documented flakiness)
    Handler.ago_hidden_indexes = {"status_idx"}
    rep = admin(stub).post_index_fields("objectid,status")
    assert rep.missing_after_settle == ["status_idx"]
    assert rep.reposted == ["status_idx"]
    # the repost carries the real field spec, not name_idx_idx
    by_name = {i["name"]: i for i in Handler.ago_indexes}
    assert by_name["status_idx"]["fields"] == "status"


def test_overwrite_grants_flip_atomically_and_privacy(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "store"))
    df = spark.range(3).toDF("id")
    store.overwrite("t", df, select_users=["publicuser", "etl_ro"])
    assert store.properties("t")["grants"]["select"] == ["publicuser", "etl_ro"]
    assert store.enforce_privacy("t") == "PUBLIC"
    assert store.properties("t")["privacy"] == "PUBLIC"

    # re-publish without publicuser -> PRIVATE
    store.overwrite("t", df, select_users=["etl_ro"])
    assert store.enforce_privacy("t") == "PRIVATE"

    # no grants recorded at all -> PRIVATE (reference default branch)
    store.overwrite("t2", df)
    assert store.enforce_privacy("t2") == "PRIVATE"
