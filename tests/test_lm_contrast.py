"""DSIR-style lm_contrast — fused two-model scoring pinned exactly
equal to the composed pair of lm_score runs, and the self-contrast
zero identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from smartglass_ocr_spark.ops.textstats import lm_contrast, lm_score


def test_fused_equals_composed(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter(F.col("source").isin("src0", "src1"))

    got = {
        r["doc_id"]: (
            r["n_tokens"], r["target_avg_ppm"], r["background_avg_ppm"], r["weight"]
        )
        for r in lm_contrast(docs, target).collect()
    }

    t = {r["doc_id"]: r["avg_score_ppm"] for r in lm_score(docs, train=target).collect()}
    b = {
        r["doc_id"]: (r["n_tokens"], r["avg_score_ppm"])
        for r in lm_score(docs, train=None).collect()
    }
    assert set(got) == set(t) == set(b)
    for d, (n, ta, ba, w) in got.items():
        assert n == b[d][0]
        assert ta == t[d]
        assert ba == b[d][1]
        if ta is None or ba is None:
            assert w is None
        else:
            assert w == ta - ba  # same IEEE subtraction


def test_self_contrast_is_zero(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = lm_contrast(docs, docs, docs).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["weight"] in (0.0, None)


def test_target_docs_rank_above_background_only(spark):
    """Docs drawn from the target slice should on average carry
    higher weight than the rest — the property DSIR selection uses."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    target = docs.filter(F.col("source").isin("src0", "src1"))
    w = lm_contrast(docs, target).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    means = {
        r["grp"]: r["m"]
        for r in w.groupBy(
            F.col("source").isin("src0", "src1").alias("grp")
        ).agg(F.avg("weight").alias("m")).collect()
    }
    assert means[True] > means[False]


def test_null_text_docs_are_excluded_not_phantom(spark):
    """NULL-text docs must contribute NOTHING to either side of
    lm_score/lm_contrast — neither phantom bigram rows (the legacy
    sizeOfNull=-1 descending-sequence trap, r4 ADVICE) nor output
    rows. The exclusion is now an explicit scan-stage filter, not an
    accident of size(NULL) semantics."""
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha beta"), (2, None), (3, "alpha beta")],
        "doc_id long, text string",
    )
    scored = lm_score(docs).collect()
    assert sorted(r["doc_id"] for r in scored) == [1, 3]
    # token totals see only real docs: 4 + 2 tokens
    assert {r["doc_id"]: r["n_tokens"] for r in scored} == {1: 4, 3: 2}
    con = lm_contrast(docs, target=docs.filter("doc_id = 1")).collect()
    assert sorted(r["doc_id"] for r in con) == [1, 3]
