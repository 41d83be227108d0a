"""Portable deterministic hashing shared by the dedup/similarity operators.

Engine-portable by construction: every hash is plain 64-bit integer
arithmetic over `ascii(char)` / token streams, expressible identically as a
Spark Column expression, a DuckDB SQL lambda, and a numpy loop — so the
driver's oracle can recompute signatures bitwise.

- ``char_poly_hash``: h = (h·131 + ascii(c)) mod (2³¹−1) over the string's
  characters. Fits in int64 at every step (max ~2^38).
- ``affine_hash(x, a, b)``: (a·x + b) mod (2³¹−1), the classic universal
  family driving MinHash permutations; a/b derive from a seeded generator.
- 64-bit variant for SimHash: two independent 31-bit polys concatenated.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = (1 << 31) - 1  # 2147483647


def minhash_coeffs(n: int, seed: int = 7) -> list[tuple[int, int]]:
    rng = random.Random(f"minhash:{seed}")
    return [
        (rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31))
        for _ in range(n)
    ]


# ---- Spark column expressions -------------------------------------------


def char_poly_hash_col(s: Column, base: int = 131) -> Column:
    """h = foldl (h*base + ascii(c)) % M over characters — whole-stage
    codegen'd, no UDF."""
    chars = F.split(s, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % MERSENNE31,
    )


def affine_hash_col(x: Column, a: int, b: int) -> Column:
    return (x * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31)


# ---- python twins (tests / driver oracles) -------------------------------


def char_poly_hash(s: str, base: int = 131) -> int:
    h = 0
    for c in s:
        h = (h * base + ord(c)) % MERSENNE31
    return h


def affine_hash(x: int, a: int, b: int) -> int:
    return (a * x + b) % MERSENNE31


# ---- SQL twins (DuckDB) --------------------------------------------------


def char_poly_hash_sql(expr: str, base: int = 131) -> str:
    """DuckDB list_reduce over the exploded character list."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, [ascii(c) FOR c IN"
        f" string_split({expr}, '')]),"
        f" (h, c) -> (h * {base} + c) % {MERSENNE31})"
    )
