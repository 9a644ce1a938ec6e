"""Content hashing / fingerprinting column functions.

Re-expresses the reference's record-identity scheme — SHA-256 over a
canonical serialization of the whole record (T5,
producers/energinet/fetch_data_energinet.py:68-72 and the duplicate at
producers/statbank/fetch_data_statbank.py:29-31) — as pure Column
expressions that run JVM-side inside whole-stage codegen. The
reference canonicalizes by JSON-dumping with sorted keys; here
canonicalization is a fixed column order + an unambiguous field
separator, which hashes ~100 TB without ever leaving the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unit separator — cannot appear in the test data and keeps
# concat_ws-based canonicalization unambiguous ("a|bc" vs "ab|c").
SEP = "\x1f"


def content_hash(*cols: str | Column, num_bits: int = 256) -> Column:
    """SHA-2 hex digest over the canonical concatenation of ``cols``.

    Column order is the canonicalization (callers pass a fixed order,
    e.g. ``sorted(df.columns)`` to mirror the reference's sorted-key
    JSON). NULLs are distinguished from empty strings by coalescing to
    a sentinel before concat (concat_ws silently drops NULLs, which
    would collide ("a",NULL) with ("a","")).
    """
    safe = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"),
                   F.lit("\x00null"))
        for c in cols
    ]
    return F.sha2(F.concat_ws(SEP, *safe), num_bits)


def record_hash(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Whole-record hash with sorted-column canonicalization (T5)."""
    return content_hash(*sorted(cols or df.columns))


def stable_hash64(col: Column | str, salt: int = 0, hex_digits: int = 15) -> Column:
    """Deterministic positive integer hash of a string column.

    Derived from SHA-256 so the SAME value is computable in any engine
    (the DuckDB oracle does ``('0x' || substr(sha256(s),1,N))::BIGINT``)
    — unlike xxhash64/murmur3 whose constants are engine-specific.
    ``hex_digits=15`` gives 60 bits (general identity use);
    ``hex_digits=7`` gives 28 bits, the MinHash/SimHash base — small
    enough that ``a * h + b`` with 31-bit coefficients never overflows
    int64 in either engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(f"{salt}:"), c)
    return F.conv(F.substring(F.sha2(c, 256), 1, hex_digits), 16, 10).cast("long")


def normalized_text(text: Column | str) -> Column:
    """Canonical text form: lowercased, punctuation-stripped,
    whitespace-collapsed, trimmed. The shared normalization under
    fingerprint dedup and any pre-tokenization cleanup."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", ""), r" +", " ")
    )


def normalized_fingerprint(text: Column | str) -> Column:
    """Document fingerprint: SHA-256 of whitespace-collapsed, lowercased,
    punctuation-stripped text. Two documents that differ only in case,
    spacing or punctuation fingerprint identically — the cheap first
    pass of a dedup cascade (exact -> fingerprint -> MinHash)."""
    return F.sha2(normalized_text(text), 256)
