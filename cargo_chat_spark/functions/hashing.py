"""Portable (cross-engine) deterministic hashing.

Spark's xxhash64/hash and DuckDB's hash() are different functions, so any
operator whose results depend on hash values (minhash, simhash, mock
embeddings) routes through **md5** — bit-identical in every engine — and
derives integers from hex prefixes.

``h32``: first 8 md5 hex chars → BIGINT in [0, 2^32). Small enough that
(h32 % P) * multiplier stays far from int64 overflow under ANSI mode.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# Large prime for universal-hash families; (P-1)*P fits easily in int64.
PRIME = 1_000_003


def h32(text: Column) -> Column:
    """First 32 bits of md5(text) as a non-negative BIGINT."""
    return F.conv(F.substring(F.md5(text), 1, 8), 16, 10).cast("bigint")


def h32_sql(text_sql: str) -> str:
    return f"(('0x' || substring(md5({text_sql}), 1, 8))::BIGINT)"


def h32_py(text: str) -> int:
    """Python mirror (for mapInPandas-based pipelines and tests)."""
    return int(hashlib.md5(text.encode("utf-8")).hexdigest()[:8], 16)


def universal(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod PRIME over an h32 value — the minhash permutation
    family. a, b must already be < PRIME."""
    return (h % PRIME * F.lit(a) + F.lit(b)) % PRIME


def universal_sql(h_sql: str, a: int, b: int) -> str:
    return f"((({h_sql}) % {PRIME} * {a} + {b}) % {PRIME})"
