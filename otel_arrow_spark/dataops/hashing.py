"""Deterministic cross-engine hashing / shingling building blocks.

Every hash here is derived from SHA-256 so that an independent SQL oracle
(DuckDB in tests) can reproduce values bit-for-bit:

    Spark:  cast(conv(substr(sha2(s, 256), 1, 8), 16, 10) as bigint)
    DuckDB: ('0x' || substr(sha256(s), 1, 8))::BIGINT

SHA-256 is overkill cryptographically but it is the one hash both engines
(and any future oracle) agree on byte-for-byte; the cost is amortized by
Arrow-vectorized evaluation and only paid in curation jobs, not the
telemetry hot path (which uses Spark's native xxhash64/hash where no
cross-engine equality is required).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32(c: Column, seed: int | str = "") -> Column:
    """Deterministic 32-bit hash of a string column (as bigint ≥ 0)."""
    s = F.concat(c, F.lit(f"|{seed}")) if seed != "" else c
    return F.conv(F.substring(F.sha2(s, 256), 1, 8), 16, 10).cast("bigint")


def h32_sql(expr: str, seed: int | str = "") -> str:
    """DuckDB rendition of :func:`h32` (for oracle SQL generation)."""
    s = f"({expr} || '|{seed}')" if seed != "" else expr
    return f"('0x' || substr(sha256({s}), 1, 8))::BIGINT"


def words_of(text: Column) -> Column:
    """Whitespace tokenization (single-space corpus; split on ' ')."""
    return F.split(text, " ")


def shingles(w: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array.

    Documents shorter than ``n`` words produce their single partial
    shingle (``concat_ws`` skips the out-of-range nulls — identical
    semantics in DuckDB, verified in tests).
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(w, i + F.lit(j)) for j in range(n)]
            ),
        )
    )


def shingles_sql(w_expr: str, n: int = 3) -> str:
    """DuckDB rendition of :func:`shingles`."""
    parts = ", ".join(f"w[i+{j}]" for j in range(n))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({w_expr})-{n - 1},1)+1), "
        f"i -> concat_ws(' ', {parts})))"
    )


# MinHash coordinates: ONE SHA-256 per shingle, then k affine universal
# hashes (a_i·h + b_i) mod p over the base value — 8× cheaper than k
# independent SHA passes and still bit-reproducible in any SQL engine.
MINHASH_P = (1 << 31) - 1  # Mersenne prime; a·h < 2^30 · 2^32 < 2^63


def _affine(seed: int) -> tuple[int, int]:
    a = (seed * 2654435761 + 1) % (1 << 30) | 1
    b = (seed * 40503 + 12345) % MINHASH_P
    return a, b


def minhash_value(hashed: Column, seed: int) -> Column:
    """Min over pre-hashed shingles of the seed's affine mix.

    ``hashed`` = array of :func:`h32` values (compute once, reuse for
    every seed).
    """
    a, b = _affine(seed)
    return F.array_min(
        F.transform(hashed, lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P))
    )


def minhash_value_sql(hashed_expr: str, seed: int) -> str:
    a, b = _affine(seed)
    return (
        f"list_min(list_transform({hashed_expr}, "
        f"h -> (h * {a} + {b}) % {MINHASH_P}))"
    )


def hashed_shingles(sh: Column) -> Column:
    return F.transform(sh, lambda s: h32(s))


def hashed_shingles_sql(sh_expr: str) -> str:
    return f"list_transform({sh_expr}, s -> {h32_sql('s')})"
