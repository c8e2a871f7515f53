"""IVF physical layout: docs/SCALE.md claims the cluster id "doubles as
the physical partition key, so probe-time reads are partition-pruned to
nprobe/K of the corpus". This file makes that claim real: write the
IVF-assigned corpus partitionBy(cluster), probe two clusters, and prove
from the PLAN and the FILES READ that only those partitions were
scanned."""

from __future__ import annotations

from pyspark.sql import functions as F

from npm_mirror_spark.operators.similarity import ivf_assign, train_kmeans
from npm_mirror_spark.tables import load_table


def _layout(spark, sf_dir, tmp_path, k=8):
    e = load_table(spark, sf_dir, "embeddings")
    model = train_kmeans(e, k=k, n_iter=2)
    cents = [
        [v / float(1 << 24) for v in c] for c in model["centroids_q"]
    ]
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "centroid_id long, centroid_vec array<double>",
    )
    assigned = ivf_assign(e, cdf).select("vec_id", "cluster").join(e, "vec_id")
    path = str(tmp_path / "ivf_corpus")
    assigned.write.partitionBy("cluster").parquet(path)
    return path


def test_probe_reads_only_its_clusters(spark, sf_dir, tmp_path):
    path = _layout(spark, sf_dir, tmp_path)
    corpus = spark.read.parquet(path)
    probe = corpus.filter(F.col("cluster").isin(2, 5))

    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan

    # the hard evidence: the files actually read are ONLY under the two
    # probed cluster directories
    files = [
        r["file"]
        for r in probe.select(
            F.input_file_name().alias("file")
        ).distinct().collect()
    ]
    assert files, "probe must read something"
    assert all("cluster=2" in f or "cluster=5" in f for f in files)

    all_clusters = {
        r["cluster"] for r in corpus.select("cluster").distinct().collect()
    }
    assert len(all_clusters) > 2, "layout must have more partitions than probed"


def test_layout_round_trips_the_assignment(spark, sf_dir, tmp_path):
    path = _layout(spark, sf_dir, tmp_path)
    corpus = spark.read.parquet(path)
    e = load_table(spark, sf_dir, "embeddings")
    assert corpus.count() == e.count()
    # partition column type survives as int and every vector kept its id
    assert corpus.select("vec_id").distinct().count() == e.count()
