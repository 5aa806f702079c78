"""Deterministic, cross-engine text/hash fragments.

Why fragments instead of UDFs: every primitive here (normalization,
shingling, salted-md5 MinHash, SimHash bit math, Jaccard) is expressed with
built-in higher-order functions, so it runs JVM-side inside whole-stage
codegen on Spark — no Python in the hot path — and has a DuckDB twin that
produces bit-identical values for the correctness oracle. md5 is the shared
hash family: both engines agree on md5 hex output byte-for-byte, and
lexicographic MIN over salted md5 digests is a valid MinHash family member
(each salt = one independent hash function).

Spark vs DuckDB dialect notes:
* ``transform``/``aggregate``/``sequence`` (Spark) ↔ ``list_transform``/
  ``list_reduce``/``range`` (DuckDB; range is end-exclusive);
* Spark ``regexp_replace`` replaces all matches; DuckDB needs the ``'g'``
  flag;
* both engines fold floats strictly left-to-right in these fragments, so
  double arithmetic is order-stable and bit-identical.
"""

from __future__ import annotations

# -- normalization -----------------------------------------------------------


def norm_spark(col: str = "text") -> str:
    """Lowercase + whitespace-collapse + trim — the canonical form for
    dedup (mirrors what the reference would get from Postgres ``lower`` +
    ``regexp_replace``; dedup itself is new surface, SURVEY §7.2.7)."""
    return f"trim(regexp_replace(lower({col}), '\\\\s+', ' '))"


def norm_duck(col: str = "text") -> str:
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


# -- character shingles ------------------------------------------------------


def shingles_spark(norm: str, k: int = 5) -> str:
    """All character k-grams of a normalized string (1-indexed substring in
    both engines). ``greatest(...,1)`` keeps short docs from producing an
    empty set."""
    return (
        f"transform(sequence(1, greatest(length({norm}) - {k - 1}, 1)), "
        f"i -> substring({norm}, i, {k}))"
    )


def shingles_duck(norm: str, k: int = 5) -> str:
    return (
        f"list_transform(range(1, greatest(length({norm}) - {k - 1}, 1) + 1), "
        f"i -> substr({norm}, i::INT, {k}))"
    )


def tokens_spark(norm: str) -> str:
    return f"split({norm}, ' ')"


def tokens_duck(norm: str) -> str:
    return f"string_split({norm}, ' ')"


# -- MinHash (salted md5, B bands x R rows) ----------------------------------


def minhash_spark(shingles: str, salt: str) -> str:
    """One MinHash value: lexicographic min of salted md5 digests."""
    return f"array_min(transform({shingles}, s -> md5(concat('{salt}:', s))))"


def minhash_duck(shingles: str, salt: str) -> str:
    return f"list_min(list_transform({shingles}, s -> md5('{salt}:' || s)))"


def band_signature_spark(shingles: str, band: int, rows: int) -> str:
    """Band signature = concat of R independent MinHashes. Two docs collide
    on a band with probability jaccard^R — R tunes precision, the band
    count B tunes recall (1-(1-j^R)^B)."""
    parts = ", ".join(minhash_spark(shingles, f"b{band}r{r}") for r in range(rows))
    return f"concat_ws('|', {parts})"


def band_signature_duck(shingles: str, band: int, rows: int) -> str:
    parts = " || '|' || ".join(minhash_duck(shingles, f"b{band}r{r}") for r in range(rows))
    return f"({parts})"


# -- Jaccard over distinct shingle sets --------------------------------------


def jaccard_spark(s1: str, s2: str) -> str:
    return (
        f"CAST(size(array_intersect(array_distinct({s1}), array_distinct({s2}))) AS DOUBLE) / "
        f"size(array_union({s1}, {s2}))"
    )


def jaccard_duck(s1: str, s2: str) -> str:
    return (
        f"len(list_intersect(list_distinct({s1}), list_distinct({s2})))::DOUBLE / "
        f"len(list_distinct({s1} || {s2}))"
    )


# -- SimHash (16-bit, word tokens, md5 bit source) ---------------------------

_ODD_HEX = "('1','3','5','7','9','b','d','f')"


def simhash16_spark(tokens: str) -> str:
    """16-bit SimHash: bit j is the sign of the +/-1 vote sum over tokens,
    where token t votes by the low bit of hex digit j of md5(t). All
    integer math — bit-identical across engines."""
    vote = (
        f"aggregate({tokens}, 0, (a, t) -> "
        f"a + IF(substring(md5(t), j + 1, 1) IN {_ODD_HEX}, 1, -1))"
    )
    return (
        f"aggregate(sequence(0, 15), CAST(0 AS BIGINT), "
        f"(acc, j) -> acc + IF({vote} > 0, shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))"
    )


def simhash16_duck(tokens: str) -> str:
    vote = (
        f"list_sum(list_transform({tokens}, t -> "
        f"CASE WHEN substr(md5(t), (j + 1)::INT, 1) IN {_ODD_HEX} THEN 1 ELSE -1 END))"
    )
    return (
        f"CAST(list_sum(list_transform(range(0, 16), j -> "
        f"CASE WHEN {vote} > 0 THEN (1::BIGINT << j::INT) ELSE 0 END)) AS BIGINT)"
    )


# -- embedding math (float[] -> double, strict left fold) --------------------


def dot_spark(a: str, b: str) -> str:
    """Sequential double-precision dot product: cast each float32 exactly to
    float64, multiply pairwise, strict left fold — bit-identical to the
    DuckDB twin."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def dot_duck(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (acc, x) -> acc + x)"
    )


def norm2_spark(a: str) -> str:
    return (
        f"sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x))"
    )


def norm2_duck(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, x -> x::DOUBLE * x::DOUBLE), "
        f"(acc, x) -> acc + x))"
    )


def cosine_spark(a: str, b: str) -> str:
    return f"{dot_spark(a, b)} / ({norm2_spark(a)} * {norm2_spark(b)})"


def cosine_duck(a: str, b: str) -> str:
    return f"{dot_duck(a, b)} / ({norm2_duck(a)} * {norm2_duck(b)})"
