"""Cross-JVM correctness: the fused pipeline on a real multi-executor
``local-cluster`` (separate executor JVMs, netty shuffle, rules
modules resolved on executors via PYTHONPATH) must produce exactly
the single-JVM golden outputs. This is the deploy shape the
spark-submit launcher targets.
"""

from __future__ import annotations

import os

import pytest

from smartglass_ocr_spark.corpus import docs_to_df, generate_docs
from smartglass_ocr_spark.golden import golden_outputs


def _span_seq(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


@pytest.fixture(scope="module")
def cluster_spark():
    from pyspark.sql import SparkSession

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = (
        SparkSession.builder.master("local-cluster[2,2,2048]")
        .appName("cluster-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.executorEnv.PYTHONPATH", repo)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_fused_pipeline_on_executor_jvms(cluster_spark):
    from smartglass_ocr_spark.pipeline import explode_spans, run_pipeline_fused

    docs = generate_docs(n_docs=40, seed=13, scramble=True)
    out = run_pipeline_fused(explode_spans(docs_to_df(cluster_spark, docs)))
    got = {r["doc_id"]: r for r in out.collect()}
    for g in golden_outputs(docs):
        r = got[g["doc_id"]]
        assert _span_seq(r["spans"]) == _span_seq(g["spans"])
        assert r["summary"] == g["summary"]
        assert r["confidence"] == g["confidence"]
        assert dict(r["block_class_hist"]) == g["block_class_hist"]
