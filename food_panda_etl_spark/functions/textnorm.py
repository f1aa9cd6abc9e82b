"""Unicode normalization (NFC/NFKC) — the canonicalization step every
dedup/fingerprint pipeline runs BEFORE hashing text: visually identical
strings with different codepoint sequences ("é" composed vs
"e"+U+0301 decomposed) must hash identically or exact dedup silently
misses duplicates and BM25/TF vocabularies split terms.

This is one of the few operators with NO JVM built-in (Spark SQL has no
normalize function), so it is a justified Python boundary — implemented
the repo's only sanctioned way: an Arrow-batched ``pandas_udf`` over
``unicodedata.normalize`` (C-implemented per string; the batch loop is
the same shape as every decode stage in `functions/multimodal.py`).
Both Python's unicodedata and DuckDB's ``nfc_normalize`` implement the
Unicode standard's canonical composition, so the declared query is
fully oracled — the driver hash proves the two normalizations agree.

Scale shape: a pure narrow projection (no shuffle, no state); at 100 TB
the cost is the scan plus one Arrow round trip, and it runs ONCE per
document before the hash-based operators take over JVM-side.
"""

from __future__ import annotations

from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def nfc(s):  # type: ignore[no-untyped-def]
    """NFC (canonical composition) of a string column."""
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


@pandas_udf("string")
def nfkc(s):  # type: ignore[no-untyped-def]
    """NFKC (compatibility composition — also folds ligatures, width
    variants, superscripts; the aggressive form search pipelines use)."""
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFKC", x) if x is not None else None
    )
