"""Training-data-scale operators (driver brief: first-class components
alongside SURVEY.md §2):

- ``dedup``       — exact / normalized / n-gram Jaccard / MinHash-LSH /
                    SimHash / min-shingle fingerprinting
- ``similarity``  — brute-force cosine top-k, LSH-bucketed ANN,
                    IVF (deterministic mini-kmeans) ANN, embedding
                    near-duplicates
- ``textstats``   — language-ID, quality scoring, token counting,
                    entity harvest, signage classification
- ``windows``     — ordered reassembly, gap sessionization, per-group
                    top-k, ordered concat, tumbling windows
- ``multimodal``  — binary media columns + typed metadata, Arrow-batch
                    feature extraction (decode stubbed), frame
                    sampling, audio chunking

Hot paths are built-in-expression Spark (JVM-side, whole-stage
codegen) — no Python except the clearly-marked multimodal decode
stubs — so each SQL-expressible operator has an exact ANSI-SQL oracle
twin in ``__spark_entry__.oracle_sql``.
"""
