"""BM25 retrieval — exact-equality pins against a pure-Python
reference implementation (same ppm-grid arithmetic), tie-break and
top-k behavior, and the plan shape the 100-TB story depends on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from smartglass_ocr_spark.ops.retrieval import bm25_topk

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog chased the cat"),
    (3, "dogs and cats living together"),
    (4, "a completely unrelated sentence about spark"),
    (5, "cat cat cat cat"),
]
QUERIES = [(100, "the cat"), (200, "spark dog")]


def _py_bm25(docs, queries, k, k1=1.2, b=0.75, idf="rational"):
    """Reference BM25 on the same ppm grid, plain Python floats."""
    toks = {d: t.strip().split() for d, t in docs}
    dl = {d: len(t) for d, t in toks.items()}
    n_docs = len(docs)
    n_tok = sum(dl.values())
    avgdl = n_tok / n_docs
    out = []
    for qid, qtext in queries:
        qterms = sorted(set(qtext.strip().split()))
        scores = {}
        for d, t in toks.items():
            s = 0
            any_hit = False
            for term in qterms:
                tf = t.count(term)
                if tf == 0:
                    continue
                any_hit = True
                df = sum(1 for tt in toks.values() if term in tt)
                i = (n_docs - df + 0.5) / (df + 0.5)
                if idf == "log":
                    i = math.log(i + 1.0)
                den = tf + k1 * (1.0 - b + b * (dl[d] / avgdl))
                s += math.floor((i * ((tf * (k1 + 1.0)) / den)) * 1_000_000.0)
            if any_hit:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend(
            (qid, d, s, r + 1) for r, (d, s) in enumerate(ranked)
        )
    return sorted(out)


def _run(spark, k=3, **kw):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    got = bm25_topk(docs, queries, k=k, **kw)
    return sorted(tuple(r) for r in got.collect())


def test_bm25_matches_python_reference(spark):
    assert _run(spark, k=3) == _py_bm25(DOCS, QUERIES, k=3)


def test_bm25_log_idf_matches_python_reference(spark):
    assert _run(spark, k=3, idf="log") == _py_bm25(DOCS, QUERIES, k=3, idf="log")


def test_bm25_only_matching_docs_returned(spark):
    rows = _run(spark, k=10)
    # doc 4 matches only query 200 ('spark'); doc 5 only query 100
    assert (200, 4) in {(q, d) for q, d, _, _ in rows}
    assert all(d != 4 for q, d, _, _ in rows if q == 100)


def test_bm25_k_caps_and_ranks_dense(spark):
    rows = _run(spark, k=2)
    by_q = {}
    for q, d, s, r in rows:
        by_q.setdefault(q, []).append((r, s, d))
    for q, entries in by_q.items():
        entries.sort()
        assert [e[0] for e in entries] == list(range(1, len(entries) + 1))
        assert len(entries) <= 2
        # scores non-increasing, doc_id tie-break ascending
        for (r1, s1, d1), (r2, s2, d2) in zip(entries, entries[1:]):
            assert s1 > s2 or (s1 == s2 and d1 < d2)


def test_bm25_plan_shape(spark):
    """Corpus parquet scanned exactly twice (slim dl projection +
    token explode); query-term prune and df/stats joins all broadcast
    — no SortMergeJoin anywhere on the query-side frames."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim("text"), r"\s+"), 1, 5)
        ).alias("query_text"),
    )
    df = bm25_topk(docs, queries, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every multi-consumer frame (tf, dl, qt) is cached — corpus
    # FileScans appear only inside InMemoryRelation bodies, so the
    # token explode and the slim dl projection each execute ONCE at
    # materialization regardless of how often the plan text prints
    # the cached child
    assert plan.count("InMemoryRelation") >= 3, plan
    assert "InMemoryTableScan" in plan, plan
    for l in plan.splitlines():
        if "FileScan" in l:
            assert "ReadSchema: struct<doc_id:bigint,text:string>" in l, l
    # query-term prune reaches the token scan stage as a broadcast
    # LEFT SEMI; df/stats/query joins are all broadcast — a shuffle
    # join on the query side would be a scale regression
    assert "LeftSemi, BuildRight" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan, plan


def test_bm25_empty_query_set(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame([], "query_id long, query_text string")
    assert bm25_topk(docs, queries, k=3).count() == 0
