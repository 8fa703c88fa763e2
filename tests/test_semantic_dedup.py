"""SemDeDup composition — hand-pinned cluster/pair/keep behavior for
all three keep policies, and composition equality against the
independent assign → pairs → components chain on real embeddings."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from smartglass_ocr_spark.ops.similarity import semantic_dedup

# two orthogonal centroids in 4d; three clustered families
CENTS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
VECS = [
    (1, [1.0, 0.0, 0.0, 0.0]),   # cid0, csim 1.0
    (2, [0.9, 0.1, 0.0, 0.0]),   # cid0, near v1/v3
    (3, [0.8, 0.2, 0.0, 0.0]),   # cid0, near v1/v2 (lowest csim)
    (4, [0.0, 1.0, 0.0, 0.0]),   # cid1, csim 1.0
    (5, [0.0, 0.9, 0.1, 0.0]),   # cid1, near v4
    (6, [0.0, 0.0, 0.0, 1.0]),   # orthogonal to both — singleton
]


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def _df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>")


def _run(spark, keep):
    out = semantic_dedup(
        _df(spark), CENTS, threshold=0.95, keep=keep, round_dp=6
    )
    return {r["vec_id"]: (r["component_id"], r["csim"]) for r in out.collect()}


def test_hand_graph_components_and_peripheral_keep(spark):
    # pairs >= 0.95: {1,2,3} (cos(1,2)=.994, cos(2,3)=.993, cos(1,3)=.970)
    # and {4,5}; v6 ties 0.0/0.0 to cid0 but is orthogonal to all
    assert _cos(VECS[0][1], VECS[2][1]) > 0.95
    got = _run(spark, "peripheral")
    # peripheral keeps the member FARTHEST from its centroid
    assert set(got) == {3, 5, 6}
    assert got[3][0] == 1 and got[5][0] == 4 and got[6][0] == 6
    assert got[3][1] == pytest.approx(round(_cos(VECS[2][1], CENTS[0]), 6))
    assert got[6][1] == 0.0


def test_hand_graph_central_and_min_id_keep(spark):
    central = _run(spark, "central")
    assert set(central) == {1, 4, 6}
    min_id = _run(spark, "min_id")
    assert set(min_id) == {1, 4, 6}
    assert min_id[1][0] == 1 and min_id[4][0] == 4


def test_rejects_unknown_policy(spark):
    with pytest.raises(ValueError):
        semantic_dedup(_df(spark), CENTS, keep="best")


def test_composition_matches_independent_chain(spark):
    """min_id keep set on real embeddings == all ids minus non-label
    members of the independently-computed component set."""
    from smartglass_ocr_spark.ops.dedup import duplicate_components
    from smartglass_ocr_spark.ops.similarity import (
        cosine_self_near_dup, fixed_random_centroids, ivf_assign,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    cents = fixed_random_centroids(8, dim)

    got = {
        r["vec_id"]
        for r in semantic_dedup(
            emb, cents, threshold=0.3, keep="min_id", round_dp=6
        ).collect()
    }

    assigned = ivf_assign(emb, cents, round_dp=6)
    pairs = cosine_self_near_dup(
        emb, threshold=0.3,
        bucketed=assigned.select("vec_id", "v", F.col("cid").alias("bucket")),
    )
    comps = duplicate_components(pairs, a_col="vec_a", b_col="vec_b")
    drop = {
        r["doc_id"]
        for r in comps.filter(F.col("doc_id") != F.col("component_id")).collect()
    }
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert got == all_ids - drop
    assert len(drop) > 0  # threshold chosen so the graph is non-trivial


def test_no_pairs_above_threshold_keeps_everything(spark):
    out = semantic_dedup(_df(spark), CENTS, threshold=0.9999, keep="peripheral", round_dp=6)
    rows = {r["vec_id"]: r["component_id"] for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    assert all(rows[v] == v for v in rows)  # every doc its own singleton
