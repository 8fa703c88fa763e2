"""Deterministic sampling/split operators (ops/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark.sql import Window

from smartglass_ocr_spark.ops.sampling import (
    hash_sample,
    hash_split,
    length_buckets,
    mixture_sample,
    sequence_pack,
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


def test_mixture_sample_rates_and_caps(spark, docs):
    """3x on src0/src1, drop src2, 1x rest: the upweighted sources
    bind the cap (kept 100%), weight-1 sources downsample to ~1/3,
    weight-0 vanishes — and no source is ever upsampled."""
    out = mixture_sample(docs, {"src0": 3.0, "src1": 3.0, "src2": 0.0})
    kept = {r["source"]: r["n"] for r in
            out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kept["src0"] == avail["src0"] and kept["src1"] == avail["src1"]
    assert "src2" not in kept
    for s, n in kept.items():
        assert n <= avail[s], s  # Bernoulli: never upsampled
        if s not in ("src0", "src1"):
            # rate = 25/3/25 = 1/3; md5 uniformity over 25 draws
            assert 2 <= n <= 16, (s, n)
    # deterministic + layout-invariant
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in mixture_sample(
            docs.repartition(9), {"src0": 3.0, "src1": 3.0, "src2": 0.0}
        ).collect()
    )
    assert a == b


def test_mixture_sample_validation_and_plan(spark, docs):
    with pytest.raises(ValueError, match="at least one source"):
        mixture_sample(docs, {})
    with pytest.raises(ValueError, match=">= 0"):
        mixture_sample(docs, {"src0": -1.0})
    # the corpus is never shuffled: rates arrive by broadcast join,
    # the only exchanges belong to the |sources|-row counts agg
    plan = (
        mixture_sample(docs, {"src0": 2.0})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def _naive_pack(toks, window):
    """The definitionally-correct form: one GLOBAL-order cumsum."""
    run = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    start = F.sum("n_tokens").over(run) - F.col("n_tokens")
    off = start % window
    return {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["spans_boundary"])
        for r in toks.select(
            "doc_id",
            F.floor(start / window).alias("pack_id"),
            off.alias("pack_offset"),
            ((off + F.col("n_tokens")) > window).cast("int").alias(
                "spans_boundary"
            ),
        ).collect()
    }


@pytest.fixture(scope="module")
def doc_tokens(spark, docs):
    from smartglass_ocr_spark.ops.textstats import token_counts

    return token_counts(docs).select("doc_id", "n_tokens")


@pytest.mark.parametrize("group_size", [1, 64, 10_000])
def test_sequence_pack_equals_global_cumsum(spark, doc_tokens, group_size):
    """The two-phase grouped prefix must be bit-equal to the naive
    single-partition global cumsum for ANY group size (1 = one group
    per doc, 10_000 = whole corpus in one group — both degenerate
    ends exercise the per-group totals / within-group split)."""
    want = _naive_pack(doc_tokens, 512)
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["spans_boundary"])
        for r in sequence_pack(
            doc_tokens, window=512, group_size=group_size
        ).collect()
    }
    assert got == want


def test_sequence_pack_invariants_and_partition_invariance(
    spark, doc_tokens
):
    rows = sequence_pack(doc_tokens, window=512, group_size=64).collect()
    total = sum(r["n_tokens"] for r in rows)
    for r in rows:
        assert 0 <= r["pack_offset"] < 512
        assert r["spans_boundary"] == int(r["pack_offset"] + r["n_tokens"] > 512)
    # every pack id up to the last token's pack is started by some doc
    # only if offsets line up — weaker, always-true invariant: ids are
    # within the token-budget range
    assert all(0 <= r["pack_id"] <= total // 512 for r in rows)
    # physical layout of the input must not change the packing
    re7 = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in sequence_pack(
            doc_tokens.repartition(7), window=512, group_size=64
        ).collect()
    }
    assert re7 == {
        r["doc_id"]: (r["pack_id"], r["pack_offset"]) for r in rows
    }


def test_sequence_pack_plan_no_global_sort_of_corpus(spark, doc_tokens):
    """Scale pin: the only unpartitioned window runs over the tiny
    per-group totals frame; the corpus-sized frame sees a PARTITIONED
    window plus a broadcast join — never a global single-partition
    sort of all rows."""
    df = sequence_pack(doc_tokens, window=512, group_size=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    # exactly one single-partition exchange (the totals running sum)
    assert plan.count("Exchange SinglePartition") == 1, plan


def test_hash_split_rejects_zero_weight_sum(spark, docs):
    import pytest

    with pytest.raises(ValueError, match="weights must sum to > 0"):
        hash_split(docs, weights={"a": 0.0, "b": 0.0})


def test_shuffle_shard_deterministic_permutation(spark, docs):
    from smartglass_ocr_spark.ops.sampling import shuffle_shard

    a = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffle_shard(docs, n_shards=8).collect()
    }
    # layout-invariant: same assignment from a different physical layout
    b = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffle_shard(docs.repartition(13), n_shards=8).collect()
    }
    assert a == b
    # a permutation: within each shard, pos is exactly 1..len(shard)
    by_shard: dict[int, list[int]] = {}
    for shard, pos in a.values():
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) == set(range(8))
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # a new seed is a new epoch: membership of the corpus is identical
    # but the permutation differs
    c = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffle_shard(docs, n_shards=8, seed="epoch1").collect()
    }
    assert set(c) == set(a) and c != a


def test_shuffle_shard_single_exchange_when_prepartitioned(spark, docs):
    """pre_partition=True: the explicit n_shards repartition satisfies
    the window's clustering requirement — exactly ONE exchange total,
    no second exchange for the row_number."""
    from smartglass_ocr_spark.ops.sampling import shuffle_shard

    plan = (
        shuffle_shard(docs, n_shards=8, pre_partition=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_write_shuffle_shards_one_sorted_file_per_shard(spark, docs, tmp_path):
    from smartglass_ocr_spark.ops.sampling import shuffle_shard, write_shuffle_shards

    path = str(tmp_path / "shards")
    write_shuffle_shards(docs, path, n_shards=8)
    import glob

    for k in range(8):
        files = glob.glob(f"{path}/shard={k}/*.parquet")
        assert len(files) == 1, (k, files)
    back = spark.read.parquet(path)
    want = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shuffle_shard(docs, n_shards=8).collect()
    }
    got = {(r["doc_id"], r["shard"], r["pos"]) for r in back.collect()}
    assert got == want
    # rows inside each shard file are physically in pos order (the
    # training reader streams sequentially, no sort at read time)
    import pyarrow.parquet as pq

    for k in range(8):
        (f,) = glob.glob(f"{path}/shard={k}/*.parquet")
        pos = pq.read_table(f, columns=["pos"]).column("pos").to_pylist()
        assert pos == sorted(pos), k


class TestChunkDocuments:
    DOCS = [(1, "a b c d e"), (2, "a b c d"), (3, "a b c"), (4, "a")]

    def _run(self, spark, **kw):
        from smartglass_ocr_spark.ops.sampling import chunk_documents

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        out = chunk_documents(docs, chunk_tokens=3, overlap=1, **kw)
        return sorted(tuple(r) for r in out.collect())

    def test_hand_chunks(self, spark):
        assert self._run(spark) == [
            (1, 0, "a b c", 3),
            (1, 1, "c d e", 3),
            (2, 0, "a b c", 3),
            (2, 1, "c d", 2),
            (3, 0, "a b c", 3),
            (4, 0, "a", 1),
        ]

    def test_no_degenerate_trailing_chunk(self, spark):
        # n=3 == chunk: a start<=n loop would emit a second chunk
        # ('c') fully contained in the first; the ceil form does not
        rows = [r for r in self._run(spark) if r[0] == 3]
        assert len(rows) == 1

    def test_last_chunk_reaches_end_and_strides_cover(self, spark):
        from smartglass_ocr_spark.ops.sampling import chunk_documents

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = chunk_documents(docs, chunk_tokens=32, overlap=8)
        joined = (
            out.groupBy("doc_id")
            .agg(
                F.max(F.col("chunk_id") * 24 + F.col("n_chunk_tokens")).alias("covered"),
                F.count("*").alias("n_chunks"),
            )
            .join(
                docs.select(
                    "doc_id",
                    F.size(F.split(F.trim("text"), r"\s+")).alias("n"),
                ),
                "doc_id",
            )
        )
        bad = joined.filter(F.col("covered") != F.col("n")).count()
        assert bad == 0

    def test_overlap_validation(self, spark):
        from smartglass_ocr_spark.ops.sampling import chunk_documents

        docs = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=8, overlap=8)

    def test_plan_zero_shuffle(self, spark):
        from smartglass_ocr_spark.ops.sampling import chunk_documents

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = (
            chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
        assert plan.count("FileScan") == 1, plan


class TestLeakageSafeSplit:
    def test_component_members_share_split_and_singletons_match_hash_split(self, spark):
        from smartglass_ocr_spark.ops.dedup import (
            duplicate_components, minhash_lsh_candidates,
        )
        from smartglass_ocr_spark.ops.sampling import hash_split, leakage_safe_split

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        pairs = minhash_lsh_candidates(docs)
        comps = duplicate_components(pairs)
        out = leakage_safe_split(docs, comps)

        comp_map = {r["doc_id"]: r["component_id"] for r in comps.collect()}
        split_map = {r["doc_id"]: r["split"] for r in out.collect()}
        assert set(split_map) == {r["doc_id"] for r in docs.collect()}

        # every component's members agree, and equal the label's own split
        by_comp = {}
        for d, c in comp_map.items():
            by_comp.setdefault(c, []).append(d)
        assert any(len(v) > 1 for v in by_comp.values())
        for c, members in by_comp.items():
            splits = {split_map[m] for m in members}
            assert len(splits) == 1, (c, members, splits)
            assert split_map[c] == splits.pop()

        # docs with no near-dup split exactly as plain hash_split
        plain = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
        for d, s in split_map.items():
            if d not in comp_map:
                assert s == plain[d]

    def test_zero_corpus_shuffle_plan(self, spark):
        from smartglass_ocr_spark.ops.sampling import leakage_safe_split

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        comps = spark.createDataFrame(
            [(1, 1), (2, 1)], "doc_id long, component_id long"
        )
        plan = (
            leakage_safe_split(docs, comps)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" not in plan, plan


def test_chunk_documents_null_text_yields_no_chunks(spark):
    """NULL text must produce NO chunk rows: greatest/least ignore
    NULL operands, so before the explicit filter a NULL-text doc
    emitted one bogus chunk with empty text and n_chunk_tokens equal
    to the full chunk size (r4 ADVICE). Empty text keeps its existing
    one-empty-token chunk semantics."""
    from smartglass_ocr_spark.ops.sampling import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, None), (3, "")], "doc_id long, text string"
    )
    out = chunk_documents(docs, chunk_tokens=3, overlap=1).collect()
    assert sorted({r["doc_id"] for r in out}) == [1, 3]
    empty = [r for r in out if r["doc_id"] == 3]
    assert len(empty) == 1 and empty[0]["n_chunk_tokens"] == 1
