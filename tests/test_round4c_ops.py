"""Round-4 final-wave operators: leakage-safe cluster-granular
train/val/test splitting."""

import pytest
from pyspark.sql import functions as F

from yahoo_anomaly_detection_spark.operators import dedup


@pytest.fixture(scope="module")
def docs80(spark):
    return spark.range(80).select(
        F.col("id").alias("doc_id"),
        # doc-unique vocabulary: no cross-doc shingle collisions, so
        # the only near-dup clusters are the planted 3-member chains
        F.expr(
            "concat_ws(' ', transform(sequence(0, 19), "
            "i -> concat('d', id, 'w', i)))"
        ).alias("text"),
    )


def test_cluster_split_no_leakage_across_splits(spark, docs80):
    """Every near-dup cluster lands in exactly ONE split — the whole
    point of the operator: no val/test doc may have a near-copy in
    train."""
    out = dedup.cluster_split(docs80).cache()
    per_key = (
        out.groupBy("split_key")
        .agg(F.countDistinct("split").alias("n_splits"),
             F.count("*").alias("members"))
    )
    assert per_key.where(F.col("n_splits") != 1).count() == 0
    # the planted 3-member dup chains exist and are split-atomic
    assert per_key.where(F.col("members") >= 3).count() > 0
    # cross-check against the cluster relation itself: cluster id IS
    # the split key for every clustered doc
    cc = dedup.dup_clusters(docs80)
    joined = out.join(cc, "doc_id", "inner")
    assert joined.where(
        F.col("split_key") != F.col("cluster")).count() == 0
    out.unpersist()


def test_cluster_split_covers_corpus_exactly_once(spark, docs80):
    out = dedup.cluster_split(docs80)
    corpus = dedup.with_dup_chains(docs80).select("doc_id")
    assert out.count() == corpus.count()
    assert out.select("doc_id").distinct().count() == corpus.count()
    assert out.join(corpus, "doc_id", "left_anti").count() == 0


def test_cluster_split_deterministic_and_salt_independent(spark, docs80):
    a = {(r.doc_id, r.split) for r in
         dedup.cluster_split(docs80, salt="cs0").collect()}
    b = {(r.doc_id, r.split) for r in
         dedup.cluster_split(docs80, salt="cs0").collect()}
    assert a == b
    c = {(r.doc_id, r.split) for r in
         dedup.cluster_split(docs80, salt="other").collect()}
    assert a != c  # an independent draw reassigns someone


def test_cluster_split_ratios_approximate(spark, docs80):
    out = dedup.cluster_split(docs80, ratios=(0.8, 0.1))
    keys = out.select("split_key", "split").distinct()
    n = keys.count()
    train = keys.where(F.col("split") == "train").count()
    # 80 distinct keys at p=0.8: allow a generous binomial band
    assert 0.6 < train / n < 0.95
    assert keys.where(F.col("split").isin("val", "test")).count() > 0
