"""PII redaction for training corpora (the pre-release scrub every
LLM data pipeline runs: emails, phone numbers, IP addresses masked
before text leaves the trusted zone).

Spark-first shape: one narrow whole-stage-codegen projection — a chain
of ``regexp_replace`` calls plus ``regexp_extract_all`` match counts.
No shuffle, no UDF, embarrassingly parallel; at 100 TB this runs at
scan speed alongside any other narrow map.

Determinism: the patterns below use only syntax shared by Java regex
(Spark) and RE2 (DuckDB) — character classes, bounded repetition,
ASCII ``\\b`` word boundaries; no lookaround, no backreferences — so
the oracle's ``regexp_replace(..., 'g')`` / ``regexp_extract_all``
produce byte-identical redacted text and counts. Replacement is
left-to-right non-overlapping in both engines.

The pattern list is ordered: emails first (an email contains digit
runs a phone pattern could partially claim), then phones, then IPs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement) — ORDER MATTERS (see module docstring).
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "phone",
        r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}",
        "<PHONE>",
    ),
    (
        "ip",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
]


def redact_pii(text: Column) -> tuple[Column, list[Column]]:
    """Return (redacted_text, [count_email, count_phone, count_ip]).

    Counts are taken against the PREVIOUS stage's output (the same text
    each pattern actually rewrites), so a phone number inside an
    already-redacted email is neither double-counted nor double-masked
    — and the SQL oracle composes the identical chain."""
    counts = []
    cur = text
    for _name, pat, repl in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))))
        cur = F.regexp_replace(cur, pat, repl)
    return cur, counts
