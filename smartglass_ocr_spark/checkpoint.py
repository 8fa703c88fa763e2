"""Per-partition checkpoint/lineage + idempotent resume (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

The reference's closest analogue is the async task dict with status
polling + stale-task cleanup (ref app/api/routes.py:263-391,
1036-1150); at cluster scale that becomes a *table*:

    checkpoint(run_id, partition_id, attempt, status, n_docs, n_spans,
               started_at, finished_at, input_snapshot)
    metrics(run_id, partition_id, docs_per_sec, stage, wall_ms)

Partitions are stable hash buckets of doc_id (pmod(xxhash64(doc_id))),
so re-runs see the same doc->partition mapping regardless of input
file layout. Resume = LEFT ANTI JOIN of buckets against completed
checkpoint rows (J5 in SURVEY.md §2.3). Output is written with
dynamic partition overwrite keyed by the same partition_id, so a
re-run of a partition replaces exactly its own files — idempotent.

Storage is parquet here (no Iceberg runtime jars in this sandbox);
the layout (append-only checkpoint log + partition-overwrite output)
is chosen so swapping in an Iceberg catalog is a format string change,
with ``input_snapshot`` recording the Iceberg snapshot id read.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

CHECKPOINT_SCHEMA = (
    "run_id string, partition_id int, attempt int, status string, "
    "n_docs long, n_spans long, started_at timestamp, "
    "finished_at timestamp, input_snapshot string"
)
METRICS_SCHEMA = (
    "run_id string, run_seq long, partition_id int, docs_per_sec double, "
    "spans_per_sec double, stage string, wall_ms long, n_truncated long"
)


def with_partition_id(documents: DataFrame, n_partitions: int) -> DataFrame:
    return documents.withColumn(
        "partition_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_partitions)).cast("int")
    )


def completed_partitions(spark: SparkSession, checkpoint_path: str) -> set[int]:
    try:
        rows = (
            spark.read.parquet(checkpoint_path)
            .filter(F.col("status") == "complete")
            .select("partition_id")
            .distinct()
            .collect()
        )
    except Exception:  # first run: no checkpoint table yet
        return set()
    return {r["partition_id"] for r in rows}


def _append_checkpoint(spark: SparkSession, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, CHECKPOINT_SCHEMA).write.mode("append").parquet(path)


def _append_metrics(spark: SparkSession, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, METRICS_SCHEMA).write.mode("append").parquet(path)


def _read_metrics(spark: SparkSession, path: str) -> DataFrame:
    """Metrics log read with the schema PINNED: a directory containing
    files written before a schema addition (e.g. pre-``run_seq``)
    still reads — missing columns come back null — instead of Spark
    sampling an old footer and failing to resolve the new column."""
    return spark.read.schema(METRICS_SCHEMA).parquet(path)


def ewma_metrics(
    spark: SparkSession, metrics_path: str, alpha: float = 0.7
) -> DataFrame:
    """A8 rolling-stat analogue (ref lib/smartglass_ocr.py:1022-1075:
    EWMA 0.7/0.3 success-rate accumulator): per partition, the
    exponentially weighted docs/sec across runs in run_id order —
    computed as an in-row fold over the per-partition run history
    (collect_list + array_sort + aggregate), one hash-agg shuffle.
    Unlike the reference's mutable global, this is recomputed from
    the immutable metrics log, so it is deterministic and replayable.

    Fold order is the monotonic ``run_seq`` the job records (NOT the
    run_id string — lexicographic run-id order breaks at 'run-10' vs
    'run-2'); rows from a pre-``run_seq`` log fold first (seq 0).
    ``run_seq`` is derived as max+1 over the existing log, which
    assumes a SINGLE WRITER per metrics path (two concurrent jobs
    could read the same max and both record the same seq); duplicate
    seqs still fold in a stated, deterministic order because run_id
    is the tie-break in the sort struct."""
    m = _read_metrics(spark, metrics_path)
    runs = F.array_sort(
        F.collect_list(
            F.struct(
                F.coalesce("run_seq", F.lit(0)).alias("run_seq"),
                "run_id",
                "docs_per_sec",
            )
        )
    )
    ewma = F.aggregate(
        runs,
        F.lit(None).cast("double"),
        lambda acc, r: F.when(acc.isNull(), r["docs_per_sec"]).otherwise(
            F.lit(alpha) * acc + F.lit(1 - alpha) * r["docs_per_sec"]
        ),
    )
    return m.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.round(ewma, 3).alias("ewma_docs_per_sec"),
        F.round(F.avg("docs_per_sec"), 3).alias("mean_docs_per_sec"),
    )


def run_extraction_job(
    spark: SparkSession,
    documents: DataFrame,
    output_path: str,
    checkpoint_path: str,
    metrics_path: str,
    run_id: str,
    n_partitions: int = 64,
    input_snapshot: str = "parquet",
    two_phase: bool = False,
    use_fused: bool = True,
    max_doc_spans: int | None = None,
    max_doc_bytes: int | None = None,
) -> dict:
    """Run the extraction pipeline partition-incrementally.

    Returns {"processed": [...], "skipped": [...]} partition ids.
    Re-running after success is a no-op; re-running after a partial
    failure processes only the incomplete partitions and overwrites
    only their own output files.

    ``use_fused``: the input here is already doc-shaped (one row =
    one whole spans array), so the fused doc stage runs with ZERO
    reassembly shuffle — the only exchange left is the output
    clustering by partition_id. Set False (optionally with
    ``two_phase``) to route through the staged explode/reassemble
    pipeline, e.g. when mega-docs need segment-level pre-assembly.

    ``max_doc_spans``/``max_doc_bytes`` (fused path only): the mega-doc
    clamp levers. When set, each output row carries
    ``n_truncated_spans`` and the metrics log's ``n_truncated`` column
    records per partition how many spans the clamp dropped (r3 VERDICT
    #6 — at 100 TB the clamp's cost must be auditable, not silent).
    Keep cap settings consistent per output path: the truncation
    column exists only in capped runs' files.
    """
    from smartglass_ocr_spark.pipeline import fused_doc_stage, run_pipeline

    if (max_doc_spans is not None or max_doc_bytes is not None) and not use_fused:
        raise ValueError("max_doc_* caps require use_fused=True")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    bucketed = with_partition_id(documents, n_partitions)
    done = completed_partitions(spark, checkpoint_path)
    todo = bucketed.filter(~F.col("partition_id").isin(list(done))) if done else bucketed

    # monotonic fold position for the EWMA (run_id strings sort
    # lexicographically — 'run-10' < 'run-2'); the metrics log itself
    # records the sequence, so replays stay deterministic. The pinned-
    # schema read tolerates pre-run_seq log files (null -> seq 0).
    # SINGLE-WRITER assumption: max+1 is not safe under concurrent
    # jobs sharing one metrics path — duplicates then fold in the
    # (run_seq, run_id) order ewma_metrics documents.
    from pyspark.errors import AnalysisException

    try:
        run_seq = (
            _read_metrics(spark, metrics_path)
            .agg(F.max(F.coalesce("run_seq", F.lit(0))))
            .collect()[0][0]
            or 0
        ) + 1
    except AnalysisException:  # first run: no metrics log yet
        run_seq = 1

    started = datetime.now(timezone.utc)
    t0 = time.perf_counter()
    # partition_id is a pure function of doc_id — recompute instead of
    # joining back (saves a shuffle)
    cleaned = (
        fused_doc_stage(
            todo.drop("partition_id"),
            max_doc_spans=max_doc_spans,
            max_doc_bytes=max_doc_bytes,
        )
        if use_fused
        else run_pipeline(todo.drop("partition_id"), two_phase=two_phase)
    )
    # n_spans materialized as a plain int column so the post-write
    # lineage pass prunes to (partition_id, n_spans) — it never re-reads
    # the payload columns (VERDICT r1: the old sum(size(spans)) rescan
    # dragged the whole spans column through a second full scan)
    result = with_partition_id(cleaned, n_partitions).withColumn(
        "n_spans", F.size("spans")
    )
    # one pass: write output partitioned by the stable bucket id;
    # an Observation rides the write for exactly-once global totals
    # (returned in the result dict — no extra job)
    from pyspark.sql import Observation

    obs = Observation(f"extract_{run_id}")
    observed = result.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_spans").alias("n_spans"),
    )
    (
        observed.repartition("partition_id")
        .write.mode("overwrite")
        .partitionBy("partition_id")
        .parquet(output_path)
    )
    try:
        totals = obs.get
    except Exception:
        # a fully-resumed run writes zero rows in zero tasks — the
        # observation never produces its metrics row and `get` fails
        # converting it; there is genuinely nothing to report
        totals = {"n_docs": 0, "n_spans": 0}
    wall_ms = int((time.perf_counter() - t0) * 1000)
    finished = datetime.now(timezone.utc)

    # per-partition lineage: second pass prunes to the partitions this
    # run wrote (directory-key filter) and reads ONLY the int stat
    # column — ~0 bytes of payload, no rescan of prior runs' output
    stats_src = spark.read.parquet(output_path)
    if done:
        stats_src = stats_src.filter(~F.col("partition_id").isin(list(done)))
    has_trunc = "n_truncated_spans" in stats_src.columns
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_spans").alias("n_spans"),
    ]
    if has_trunc:
        aggs.append(
            F.sum(F.coalesce(F.col("n_truncated_spans"), F.lit(0))).alias("n_trunc")
        )
    stats = stats_src.groupBy("partition_id").agg(*aggs).collect()
    processed = sorted(int(r["partition_id"]) for r in stats)
    secs = max(wall_ms, 1) / 1000.0
    ckpt_rows, metric_rows = [], []
    for r in stats:
        pid = int(r["partition_id"])
        ckpt_rows.append(
            (run_id, pid, 1, "complete", r["n_docs"], r["n_spans"], started, finished, input_snapshot)
        )
        metric_rows.append(
            (
                run_id, run_seq, pid,
                round(r["n_docs"] / secs, 3),
                round((r["n_spans"] or 0) / secs, 3),
                "extract", wall_ms,
                int(r["n_trunc"] or 0) if has_trunc else 0,
            )
        )
    if ckpt_rows:
        _append_checkpoint(spark, checkpoint_path, ckpt_rows)
        _append_metrics(spark, metrics_path, metric_rows)
    return {
        "processed": processed,
        "skipped": sorted(done),
        # write-pass totals for THIS run (Observation, no extra job)
        "n_docs": int(totals.get("n_docs") or 0),
        "n_spans": int(totals.get("n_spans") or 0),
    }
