"""Domain-level curation gate (operators/curation.py::url_host /
filter_blocked_hosts) over WARC-ingested documents — the C4/RefinedWeb
first filter, fed by the r5 WARC source.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from npm_mirror_spark.operators.curation import filter_blocked_hosts, url_host
from npm_mirror_spark.sources.warc import (
    http_response,
    read_warc,
    warc_to_documents,
    write_warc,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "https://ok.example.org/page"),
        (2, "https://spam.bad.com/x"),          # subdomain of blocked bad.com
        (3, "http://bad.com/y"),                # blocked exactly
        (4, "https://user:pw@good.net:8443/z"), # userinfo + port stripped
        (5, "https://bad.com.evil.io/a"),       # NOT bad.com (suffix differs)
        (6, "not a url"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_url_host(spark, docs):
    got = {r["doc_id"]: r["h"] for r in docs.select("doc_id", url_host("url").alias("h")).collect()}
    assert got == {
        1: "ok.example.org",
        2: "spam.bad.com",
        3: "bad.com",
        4: "good.net",
        5: "bad.com.evil.io",
        6: "",
    }


def test_blocklist_with_subdomains(spark, docs):
    blocked = spark.createDataFrame([("bad.com",)], "host string")
    kept = {r["doc_id"] for r in filter_blocked_hosts(docs, blocked).collect()}
    assert kept == {1, 4, 5, 6}


def test_blocklist_exact_only(spark, docs):
    blocked = spark.createDataFrame([("bad.com",)], "host string")
    kept = {
        r["doc_id"]
        for r in filter_blocked_hosts(
            docs, blocked, include_subdomains=False
        ).collect()
    }
    assert kept == {1, 2, 4, 5, 6}


def test_all_joins_are_equi(spark, docs):
    blocked = spark.createDataFrame([("bad.com",)], "host string")
    plan = (
        filter_blocked_hosts(docs, blocked)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_warc_to_blocklist_pipeline(spark, tmp_path):
    """End-to-end ingest gate: WARC shard -> documents -> domain gate."""
    recs = [
        {
            "warc_type": "response",
            "record_id": f"r{i}",
            "target_uri": uri,
            "payload": http_response(f"body {i}".encode()),
        }
        for i, uri in enumerate(
            ["https://keep.org/a", "https://x.spamfarm.net/b", "https://keep.org/c"]
        )
    ]
    write_warc(str(tmp_path / "s.warc.gz"), recs)
    docs = warc_to_documents(read_warc(spark, str(tmp_path)))
    blocked = spark.createDataFrame([("spamfarm.net",)], "host string")
    out = filter_blocked_hosts(docs, blocked)
    assert {r["url"] for r in out.collect()} == {
        "https://keep.org/a",
        "https://keep.org/c",
    }


def test_single_label_host_blocks_exactly(spark):
    """Review finding: include_subdomains=True must still exact-match a
    single-label host like 'localhost' (n=1 generated no suffixes)."""
    docs = spark.createDataFrame(
        [(1, "http://localhost/admin"), (2, "https://ok.org/x"), (3, "bad url")],
        "doc_id long, url string",
    )
    blocked = spark.createDataFrame([("localhost",)], "host string")
    kept = {r["doc_id"] for r in filter_blocked_hosts(docs, blocked).collect()}
    assert kept == {2, 3}
