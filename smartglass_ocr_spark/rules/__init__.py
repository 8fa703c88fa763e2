"""Pure-Python rule modules — the executable spec of the engine.

Every function here is a deterministic ``str -> str`` (or str -> small
value) transform with NO Spark dependency. The golden generator
(``smartglass_ocr_spark.golden``) applies them driver-side to define
expected outputs; the Spark pipeline applies the *same* functions
inside Arrow-batched pandas UDFs. Hand-written edge-case unit tests in
``tests/test_rules.py`` pin each rule to the reference's cited
behavior so the shared-spec shortcut stays honest.
"""

from smartglass_ocr_spark.rules.cleanup import clean_for_class, general_cleanup
from smartglass_ocr_spark.rules.classify import classify_block, MEDIA_KINDS, TEXT_KINDS
from smartglass_ocr_spark.rules.langdetect import detect_language
from smartglass_ocr_spark.rules.structure import detect_structure

__all__ = [
    "clean_for_class",
    "general_cleanup",
    "classify_block",
    "detect_language",
    "detect_structure",
    "MEDIA_KINDS",
    "TEXT_KINDS",
]
