"""SnapshotStore: atomic versioned commits — readers pinned to a version
never see later appends, time travel works, crashed commits leave only
orphans that vacuum() clears."""

from __future__ import annotations

import os

from npm_mirror_spark.snapshot_store import SnapshotStore


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_versioned_commits_and_time_travel(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "store"))
    assert s.latest_version() == 0
    v1 = s.commit(spark.range(0, 3).selectExpr("id"))
    v2 = s.commit(spark.range(10, 13).selectExpr("id"))
    assert (v1, v2) == (1, 2)
    assert _ids(s.read()) == [0, 1, 2, 10, 11, 12]
    assert _ids(s.read(version=1)) == [0, 1, 2]


def test_reader_isolated_from_concurrent_commit(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "store"))
    s.commit(spark.range(0, 3).selectExpr("id"))
    snapshot = s.read()  # resolves the manifest NOW
    s.commit(spark.range(100, 103).selectExpr("id"))
    # the pinned reader still sees only version 1's rows
    assert _ids(snapshot) == [0, 1, 2]
    assert _ids(s.read()) == [0, 1, 2, 100, 101, 102]


def test_crashed_commit_invisible_and_vacuumable(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "store"))
    s.commit(spark.range(0, 3).selectExpr("id"))
    # simulate a crash AFTER data write, BEFORE manifest/pointer swap:
    # data files exist but nothing references them
    orphan_dir = os.path.join(s.data_dir, "b99999-deadbeef")
    spark.range(500, 503).selectExpr("id").write.parquet(orphan_dir)
    assert _ids(s.read()) == [0, 1, 2]  # reader never sees the orphans
    # default retention protects the fresh orphans: they could be an
    # in-flight writer's not-yet-published files, not a crashed commit
    assert s.vacuum() == []
    assert _ids(s.read()) == [0, 1, 2]
    # with retention waived (caller asserts no writer is active) they go
    removed = s.vacuum(min_age_seconds=0)
    assert removed and all("b99999" in p for p in removed)
    assert _ids(s.read()) == [0, 1, 2]  # referenced files untouched


def test_vacuum_retention_spares_inflight_commit_files(spark, tmp_path):
    """Race pinned: data files written by a commit whose manifest hasn't
    landed yet must survive a concurrent vacuum — age, not reference,
    decides. Aged-out orphans (backdated mtime) are still collected."""
    import time

    s = SnapshotStore(spark, str(tmp_path / "store"))
    s.commit(spark.range(0, 3).selectExpr("id"))
    inflight = os.path.join(s.data_dir, "b00002-aaaaaaaa")
    spark.range(7, 9).selectExpr("id").write.parquet(inflight)
    crashed = os.path.join(s.data_dir, "b00002-bbbbbbbb")
    spark.range(9, 11).selectExpr("id").write.parquet(crashed)
    old = time.time() - 48 * 3600
    for f in os.listdir(crashed):
        os.utime(os.path.join(crashed, f), (old, old))
    removed = s.vacuum(min_age_seconds=24 * 3600)
    assert removed and all("bbbbbbbb" in p for p in removed)
    # the in-flight files survived and their commit can still publish
    assert any(
        f.endswith(".parquet") for f in os.listdir(inflight)
    ), "vacuum deleted an in-flight commit's data files"


def test_token_makes_commit_idempotent(spark, tmp_path):
    s = SnapshotStore(spark, str(tmp_path / "store"))
    v1 = s.commit(spark.range(0, 3).selectExpr("id"), token=0)
    v_replay = s.commit(spark.range(0, 3).selectExpr("id"), token=0)
    assert v1 == v_replay == 1  # replayed batch skipped, not re-appended
    assert _ids(s.read()) == [0, 1, 2]
    v2 = s.commit(spark.range(10, 12).selectExpr("id"), token=1)
    assert v2 == 2
    assert _ids(s.read()) == [0, 1, 2, 10, 11]


def test_streaming_foreachbatch_exactly_once_sink(spark, tmp_path):
    """SnapshotStore as a transactional streaming sink: one atomic
    version per micro-batch, keyed by batch id."""
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.jsonl").write_text('{"id": 1}\n{"id": 2}\n')
    (feed / "b.jsonl").write_text('{"id": 3}\n')
    s = SnapshotStore(spark, str(tmp_path / "store"))
    stream = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: s.commit(df, token=bid)
        )
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert s.latest_version() == 2
    assert _ids(s.read()) == [1, 2, 3]


def test_expire_versions_append_vs_replace(spark, tmp_path):
    """Append-mode expiry removes only time travel (all files carried
    forward); replace-mode expiry physically reclaims the expired
    releases' files. Latest version stays byte-identical either way."""
    import os

    import pytest

    from npm_mirror_spark.snapshot_store import SnapshotStore

    def mkdf(tag):
        return spark.createDataFrame([(tag, 1), (tag, 2)], "tag string, v int")

    # append mode: nothing reclaimable
    st = SnapshotStore(spark, str(tmp_path / "app"))
    for t in ("a", "b", "c"):
        st.commit(mkdf(t))
    out = st.expire_versions(keep_last=1, min_age_seconds=0)
    assert out["versions_removed"] == [1, 2]
    assert out["files_removed"] == []  # v3's manifest references everything
    assert st.read(3).count() == 6
    with pytest.raises(FileNotFoundError):
        st.read(1)

    # replace mode: expired releases' files go away physically
    sr = SnapshotStore(spark, str(tmp_path / "rep"))
    for t in ("a", "b", "c"):
        sr.commit(mkdf(t), replace=True)
    n_files_before = sum(len(fs) for _, _, fs in os.walk(sr.data_dir))
    out = sr.expire_versions(keep_last=1, min_age_seconds=0)
    assert out["versions_removed"] == [1, 2]
    assert out["files_removed"], "replace-mode expiry must reclaim files"
    n_files_after = sum(len(fs) for _, _, fs in os.walk(sr.data_dir))
    assert n_files_after < n_files_before
    assert sorted(r["tag"] for r in sr.read().collect()) == ["c", "c"]
    with pytest.raises(FileNotFoundError):
        sr.read(2)

    # guard rails
    with pytest.raises(ValueError, match="keep_last"):
        sr.expire_versions(keep_last=0)
    # age guard: young unreferenced files survive a guarded expiry
    sr2 = SnapshotStore(spark, str(tmp_path / "guard"))
    sr2.commit(mkdf("x"), replace=True)
    sr2.commit(mkdf("y"), replace=True)
    out = sr2.expire_versions(keep_last=1, min_age_seconds=3600)
    assert out["versions_removed"] == [1] and out["files_removed"] == []
