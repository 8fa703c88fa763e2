"""Deterministic sampling/split operators (ops/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smartglass_ocr_spark.ops.sampling import (
    hash_sample,
    hash_split,
    length_buckets,
    stratified_sample,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_split_is_deterministic_and_partition_invariant(spark, docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    # same assignment regardless of physical layout
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7)).collect()
    }
    assert a == b
    # rates approximately honored (md5 uniformity; 500 docs)
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert 0.85 <= train / n <= 0.95
    assert set(a.values()) == {"train", "val", "test"}


def test_split_is_stable_under_append(spark, docs):
    """New rows must not change existing assignments (no leakage)."""
    half = docs.filter(F.col("doc_id") < 250)
    full = hash_split(docs)
    part = hash_split(half)
    want = {r["doc_id"]: r["split"] for r in full.collect()}
    for r in part.collect():
        assert want[r["doc_id"]] == r["split"]


def test_bernoulli_rate_and_salt_independence(spark, docs):
    n = docs.count()
    s1 = hash_sample(docs, 0.25)
    assert abs(s1.count() / n - 0.25) < 0.06
    # disjoint salts draw (near-)independent samples
    s2 = hash_sample(docs, 0.25, salt="other")
    overlap = s1.select("doc_id").intersect(s2.select("doc_id")).count()
    assert abs(overlap / n - 0.0625) < 0.05
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_stratified_exact_counts(spark, docs):
    out = stratified_sample(docs, "lang", 20)
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes.keys() == avail.keys()
    for lang, n in sizes.items():
        assert n == min(20, avail[lang]), lang
    # deterministic across runs
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in stratified_sample(docs, "lang", 20).collect()
    )


def test_length_buckets_partition_totals(spark, docs):
    rows = length_buckets(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert all(r["total_tokens"] > 0 for r in rows)


def test_split_and_sample_are_narrow(spark, docs):
    """The split/sample must add no exchange — pure scan-stage ops."""
    for df in (hash_split(docs), hash_sample(docs, 0.1)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_hash_split_rejects_zero_weight_sum(spark, docs):
    import pytest

    with pytest.raises(ValueError, match="weights must sum to > 0"):
        hash_split(docs, weights={"a": 0.0, "b": 0.0})
