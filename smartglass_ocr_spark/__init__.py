"""smartglass_ocr_spark — a brand-new PySpark-native document
extraction engine with the query/data-processing capabilities of
zachran-recodex/smartglass-ocr-api, re-expressed Spark-first.

The reference processes one image/PDF per HTTP request through OCR +
rule-based post-processing (``/root/reference/lib/smartglass_ocr.py``).
This engine runs the same *text-level* semantics batched over an
Iceberg/parquet table of interleaved text+media documents::

    documents(doc_id string,
              spans array<struct<kind,text,media_ref,offset>>)

as DataFrame stages: explode spans -> classify (vectorized pandas UDF)
-> clean (vectorized pandas UDF, per-block-class regex pipelines) ->
window-reassemble per (doc_id, offset) guaranteeing span-sequence
equality (kind, text, media_ref, order) against golden outputs.

Layout:
- ``rules/``    pure-Python rule modules — the executable spec shared
                by the golden generator and the pandas UDFs.
- ``pipeline``  the Spark pipeline stages (explode/classify/clean/
                reassemble + per-doc metadata).
- ``corpus``    deterministic synthetic spans-corpus generators.
- ``golden``    pure-Python golden generator (reference semantics).
- ``ops/``      training-data-scale operators: dedup (exact/minhash/
                simhash/jaccard), similarity search, text stats.
- ``checkpoint`` per-partition lineage/metrics + idempotent resume.
"""

__version__ = "0.1.0"
