"""Bloom-filter semi-join reduction (build the filter IN the plan).

Spark's own runtime row-level filtering (InjectRuntimeFilter) only
fires for shuffle joins under optimizer heuristics, and its
`bloom_filter_agg` expression is not registered for SQL/DataFrame use.
This module builds the same optimization explicitly with public
Catalyst primitives, so any fact scan can be pre-filtered by any
selective dimension regardless of join strategy:

- build: each dim key sets k = `num_hashes` bit positions
  pmod(xxhash64(key, i), num_bits); positions are packed into 64-bit
  words with a `bit_or` aggregate (k rows per key, collapsed map-side
  by the partial aggregate), then assembled into ONE row holding an
  array<long> of num_bits/64 words — entirely in-plan, no driver
  collect.
- probe: the one-row filter is cross-joined with a broadcast hint, so
  every fact partition tests keys map-side: AND over i of
  (words[h_i >> 6] & (1 << (h_i & 63))) != 0. No false negatives; the
  false-positive rate is ~(1 - e^(-k*n/m))^k (size `num_bits` at
  ~10-15 bits per expected dim key).

At 100 TB the win is a fact-side SortMergeJoin whose shuffle would
carry mostly-unmatched rows: the bloom drops them at the scan, the
filter itself costs one tiny dim shuffle plus a broadcast measured in
kilobytes-to-megabytes, and the exact join afterwards removes the few
false positives — so results are bit-identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORDS = "__bloom_words"


def _bit_mask(pos: Column) -> Column:
    # shiftleft with a COLUMN shift amount (the python helper only takes
    # a literal int)
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
    )


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(
    dim: DataFrame, key: str, num_bits: int = 1 << 17, num_hashes: int = 5
) -> DataFrame:
    """One-row DataFrame [`__bloom_words`: array<long>] covering dim[key]."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    entries = F.array(
        *[
            F.struct(
                F.shiftright(p, 6).cast("int").alias("w"),
                _bit_mask(p).alias("mask"),
            )
            for p in _positions(F.col(key), num_bits, num_hashes)
        ]
    )
    words = (
        dim.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.w").alias("w"))
        .agg(F.expr("bit_or(e.mask)").alias("bits"))
    )
    assembled = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0).cast("long")),
        ).alias(_WORDS)
    )
    return assembled


def bloom_might_contain(
    key: Column, num_bits: int, num_hashes: int = 5, words: Column | None = None
) -> Column:
    """Boolean probe against a `bloom_build` words array (no false
    negatives)."""
    if words is None:
        words = F.col(_WORDS)
    cond = F.lit(True)
    for p in _positions(key, num_bits, num_hashes):
        word = F.element_at(words, F.shiftright(p, 6).cast("int") + F.lit(1))
        cond = cond & (word.bitwiseAND(_bit_mask(p)) != 0)
    return cond


def bloom_prefilter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """fact rows whose key might appear in dim[dim_key] (superset of the
    exact semi-join; follow with the exact join for identical results)."""
    bloom = bloom_build(dim, dim_key, num_bits, num_hashes)
    probed = fact.crossJoin(F.broadcast(bloom))
    return probed.filter(
        bloom_might_contain(F.col(fact_key), num_bits, num_hashes)
    ).drop(_WORDS)


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Exact fact-dim join with a bloom semi-join reduction on the fact
    side first. Bit-identical to the plain join (the exact join removes
    bloom false positives); only `inner`/`left_semi` keep the reduction
    sound, since dropped fact rows can never match."""
    if how not in ("inner", "left_semi"):
        raise ValueError("bloom prefilter is only sound for inner/left_semi")
    reduced = bloom_prefilter(fact, dim, fact_key, dim_key, num_bits, num_hashes)
    return reduced.join(dim, reduced[fact_key] == dim[dim_key], how)
