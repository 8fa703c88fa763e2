"""Cross-JVM correctness: the fused pipeline on a real multi-executor
``local-cluster`` (separate executor JVMs, netty shuffle, rules
modules resolved on executors via PYTHONPATH) must produce exactly
the single-JVM golden outputs. This is the deploy shape the
spark-submit launcher targets.

Runs in a SUBPROCESS: ``SparkSession.getOrCreate`` inside this
process would return (and on teardown stop!) the suite's shared
session instead of building a local-cluster one.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import SparkSession
from smartglass_ocr_spark.corpus import docs_to_df, generate_docs
from smartglass_ocr_spark.golden import golden_outputs
from smartglass_ocr_spark.pipeline import explode_spans, run_pipeline_fused

spark = (
    SparkSession.builder.master("local-cluster[2,2,2048]")
    .appName("cluster-tests")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.executorEnv.PYTHONPATH", os.environ["REPO"])
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)

def span_seq(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]

docs = generate_docs(n_docs=40, seed=13, scramble=True)
out = run_pipeline_fused(explode_spans(docs_to_df(spark, docs)))
got = {r["doc_id"]: r for r in out.collect()}
for g in golden_outputs(docs):
    r = got[g["doc_id"]]
    assert span_seq(r["spans"]) == span_seq(g["spans"]), g["doc_id"]
    assert r["summary"] == g["summary"]
    assert r["confidence"] == g["confidence"]
    assert dict(r["block_class_hist"]) == g["block_class_hist"]
spark.stop()
print("CLUSTER-GOLDEN-OK")
"""


def test_fused_pipeline_on_executor_jvms():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, REPO=repo)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT], env=env, capture_output=True,
        text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "CLUSTER-GOLDEN-OK" in out.stdout
