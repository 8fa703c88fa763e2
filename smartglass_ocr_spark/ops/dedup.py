"""Deduplication operators over a document table.

All four families from the driver brief, expressed with built-in
functions only (JVM-side, codegen-friendly, shuffle-minimal):

- exact:      md5 hash-groupBy clusters
- normalized: canonicalized-text dedupe keeping the min doc_id
- n-gram Jaccard: shingle self-join -> pair similarity
- MinHash+LSH: per-band lexical-min-of-md5 signatures -> bucket join
- SimHash:    32-bit weighted fingerprint from md5 hex-digit bits

Determinism note: every hash is md5-hex (identical in Spark and
DuckDB), never xxhash/murmur (engine-specific), so each operator has
an exact SQL oracle. MinHash uses the *lexical* min of md5 strings —
a valid uniform permutation min because md5 is uniform on hex strings.

Scale notes (100 TB): the shingle explode is a narrow stage; the
self-join shuffles on the shingle key, whose skew (stop-shingles
appearing in millions of docs) is the classic hot-key problem —
``max_shingle_docs`` drops shingles above a document-frequency cap
before the join (standard LSH-banding practice), bounding pair
blowup; AQE skew-join splits the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = r"\s+"


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.trim(F.col(col)), TOKEN_SPLIT)


def exact_duplicate_clusters(
    docs: DataFrame, text_col: str = "text", min_size: int = 2
) -> DataFrame:
    """md5-exact duplicate clusters of size >= min_size.

    Single hash-agg shuffle on the digest; partial aggregation
    (map-side combine) makes the shuffle carry one row per distinct
    digest per mapper."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") >= min_size)
    )


def normalized_dedupe(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """O3 dedupe-by-normalized-form (ref lib/ocr_engines.py:817-847
    dedupes OCR lines by lower+despace; here per document): keep the
    smallest doc_id per canonical text."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return (
        docs.groupBy(norm.alias("norm_text"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_dupes"))
        .select("doc_id", "n_dupes")
    )


def shingle_rows(docs: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, shingle) rows of word n-grams — the common
    front half of Jaccard and MinHash. Narrow (explode) stage; the
    later distinct is fused with downstream aggregation."""
    toks = _tokens(text_col)
    count = F.greatest(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return docs.select("doc_id", F.explode(grams).alias("shingle")).distinct()


def jaccard_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.8,
    text_col: str = "text",
    max_shingle_docs: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard >= threshold.

    shingles -> (hot-shingle cap) -> self-join on shingle -> pair
    intersection counts -> join per-doc sizes -> |A∩B|/(|A|+|B|-|A∩B|).
    """
    sh = shingle_rows(docs, n=n, text_col=text_col)
    if max_shingle_docs is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            F.broadcast(df_counts.filter(F.col("df") > max_shingle_docs).select("shingle")),
            "shingle",
            "left_anti",
        )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "size_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_band_signatures(
    docs: DataFrame, bands: int = 8, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """(doc_id, band, sig): per-band MinHash signature = lexical min of
    md5(band || ':' || shingle). One explode + one hash-agg; the agg is
    partial-combining so the shuffle carries (doc, band) rows only."""
    sh = shingle_rows(docs, n=n, text_col=text_col)
    banded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "shingle",
    )
    return banded.groupBy("doc_id", "band").agg(
        F.min(F.md5(F.concat_ws(":", F.col("band").cast("string"), F.col("shingle")))).alias("sig")
    )


def minhash_lsh_candidates(
    docs: DataFrame, bands: int = 8, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any band signature
    (rows-per-band=1 LSH). Bucket self-join on (band, sig) — the
    bucket key is uniform by construction (md5), so no skew salting
    needed; distinct pairs out."""
    sigs = minhash_band_signatures(docs, bands=bands, n=n, text_col=text_col)
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash32(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit SimHash per doc, entirely JVM-side.

    Spec (shared with the SQL oracle): tokens = lowercase
    whitespace-split; weight = term frequency; bit i (0..31) of a
    token = high bit of hex digit i of md5(token) (digit >= '8');
    fingerprint bit i = 1 iff sum over tokens of weight * (2*bit-1)
    is > 0. Emitted as a bigint.

    Plan shape: explode tokens (narrow) -> TF hash-agg on
    (doc, token) -> explode 32 bit-lanes (narrow) -> hash-agg on
    (doc, lane) -> pivot-free bit fold per doc. Three shuffles on
    uniformly distributed keys.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim(F.col(text_col))), TOKEN_SPLIT)).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("w"))
    lanes = tf.select(
        "doc_id",
        "w",
        F.md5("tok").alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("i"),
    ).select(
        "doc_id",
        "i",
        (
            F.when(
                F.substring(F.col("h"), F.col("i") + 1, 1).isin(
                    "8", "9", "a", "b", "c", "d", "e", "f"
                ),
                F.col("w"),
            ).otherwise(-F.col("w"))
        ).alias("signed"),
    )
    bit_sums = lanes.groupBy("doc_id", "i").agg(F.sum("signed").alias("s"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("simhash")
    )


def fingerprint_min_shingle(docs: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """Single-permutation document fingerprint: min md5 over word
    n-gram shingles (winnowing-lite). One narrow explode + one
    partial-combining agg."""
    sh = shingle_rows(docs, n=n, text_col=text_col)
    return sh.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("fingerprint"))
