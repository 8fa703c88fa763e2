"""Window / ordered-reassembly operators over the driver's relational
tables — the SQL-expressible twins of the span-pipeline primitives
(SURVEY.md §2.5), exposed so the oracle harness can verify the exact
shuffle/window patterns the pipeline relies on:

- W1 ordered reassembly  -> per-key ordered sequence aggregation
- W2 gap sessionization  -> lag + cumulative-sum session ids
- A3 per-group top-k     -> row_number window
- A10 paragraph assembly -> ordered concat + bbox-style min/max aggs
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _micros(col: str | Column) -> Column:
    """Epoch micros of a (possibly NTZ) timestamp column. Parquet
    timestamps load as TIMESTAMP_NTZ in Spark 4; with the session
    timezone pinned to UTC (session.py) the LTZ cast is the identity
    on the wall-clock, matching DuckDB's epoch_us on naive values."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp_ltz"))


def ordered_reassembly(events: DataFrame) -> DataFrame:
    """W1 twin: per user, the event_type sequence in (ts, event_id)
    order as a '→'-joined string + count. Same plan shape as the span
    reassembly: one hash-partial collect + in-group sort."""
    return (
        events.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                "→",
            ).alias("event_seq"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def gap_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """W2 twin (ref lib/ocr_engines.py:534-551 vertical-gap paragraph
    break): new session when the gap to the previous event exceeds
    ``gap_minutes``. lag -> flag -> running sum = session id; then
    per-session aggregates. One shuffle on user_id reused by both
    windows and the final groupBy (same partitioning key)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = _micros("ts")
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(us - F.lag(us).over(w) > gap_us, 1).otherwise(0).alias("is_new"),
    )
    with_session = flagged.withColumn(
        "session_idx",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_session.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
        _micros(F.min("ts")).alias("start_us"),
        _micros(F.max("ts")).alias("end_us"),
    )


def topk_per_group(events: DataFrame, k: int = 3) -> DataFrame:
    """A3 twin: top-k events by value per event_type, deterministic
    tie-break on event_id. row_number window -> filter; Spark pushes
    a per-partition rank limit before the shuffle (WindowGroupLimit)."""
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("event_type", "rank", "event_id", "value")
    )


def ordered_group_concat(lineitem: DataFrame) -> DataFrame:
    """A10 twin (ref lib/ocr_engines.py:152-205 word->paragraph
    assembly: ordered concat + bbox union + mean conf): per order,
    line numbers in order, qty stats."""
    return (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("l_linenumber", "l_partkey"))),
                    lambda s: s["l_partkey"].cast("string"),
                ),
                ",",
            ).alias("part_seq"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def tumbling_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling-window counts per event_type (batch form of the
    streaming rollup; window start emitted as epoch seconds so the
    oracle compares integers, not timestamps)."""
    bucket_s = F.floor(_micros("ts") / (minutes * 60 * 1_000_000)) * (minutes * 60)
    return (
        events.groupBy(bucket_s.alias("window_start_s"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
