"""Training-data-scale operators (driver brief: first-class components
alongside SURVEY.md §2): deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard), similarity search over embeddings, and text analysis
(language-ID, quality scoring, token counting, fingerprinting).

Everything here is built-in-expression Spark (JVM-side, whole-stage
codegen) — no Python in the hot path — so each operator has an exact
ANSI-SQL oracle twin in ``__spark_entry__.oracle_sql``.
"""
