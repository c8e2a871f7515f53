"""Bloom-filter pre-filtered existence probes (the runtime-filter pattern,
hand-rolled so the sizing and the plan are explicit).

The reference's existence probe (mirror.ts:114-126, modeled by
operators/joins.py::anti_join) has two regimes at 100 TB:

- "seen" key-set fits an executor -> broadcast anti join (joins.py, the
  registered q_anti_join plan);
- "seen" key-set too big to broadcast -> the anti join becomes a full
  shuffle of BOTH sides. That is the regime this module attacks: a Bloom
  bitmap over the seen keys is bounded (``num_bits`` is a parameter, not
  a function of data size — 2^27 bits = 16 MB handles ~10^7 keys at
  ~1% FPR with k=7), travels as a literal array, and filters the probe
  side MAP-SIDE. Rows the bitmap rejects are *definitely new* and skip
  the shuffle entirely; only the (small) maybe-present remainder pays
  the exact anti-join. The result is EXACT — false positives only cost
  a second look, never a wrong answer — so the DuckDB oracle is the
  plain anti join.

Everything is JVM expressions: xxhash64 double-hashing
(Kirsch-Mitzenmacher h1 + i*h2), pmod-early so no int64 overflow under
ANSI mode (the repo-wide rule from the Knuth-hash sites), bit_or
aggregation to words, element_at + bitwiseAND probes. The only collect is
the bounded ``num_bits/64``-word bitmap — the same bounded-model contract
as similarity.train_pq.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one_shl(bits: Column) -> Column:
    """1L << bits for a COLUMN shift amount (the Python ``F.shiftleft``
    wrapper only takes a literal int)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bits)


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions per key. pmod runs BEFORE the i*h2 multiply, so the
    largest intermediate is (k-1+1) * num_bits — overflow-safe for any
    int64 key under ANSI mode."""
    h1 = F.pmod(F.xxhash64(key), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit("bloom-h2")), F.lit(num_bits)).bitwiseOR(
        F.lit(1)
    )
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> list[int]:
    """Distributed build of the bitmap: explode each key to its k bit
    positions, one (word-index) shuffle of at most ``num_bits/64`` groups,
    bit_or the masks, collect the bounded word list."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    words = (
        df.select(pos)
        .select(
            F.shiftright("pos", 6).alias("word"),
            _one_shl(F.col("pos").bitwiseAND(F.lit(63))).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )  # bounded: num_bits/64 rows by construction
    out = [0] * (num_bits // 64)
    for r in words:
        out[r["word"]] = r["bits"]
    return out


def bloom_might_contain(
    words: list[int],
    key: Column,
    num_hashes: int = 5,
) -> Column:
    """Map-side membership test: True = maybe present, False = definitely
    absent. The bitmap enters the plan as one literal array (broadcast
    with the task binary, no join)."""
    num_bits = len(words) * 64
    lit_words = F.lit(words)
    checks = [
        element.bitwiseAND(mask) != F.lit(0)
        for p in _positions(key, num_bits, num_hashes)
        for element, mask in [
            (
                F.element_at(lit_words, (F.shiftright(p, 6) + F.lit(1)).cast("int")),
                _one_shl(p.bitwiseAND(F.lit(63))),
            )
        ]
    ]
    return reduce(lambda a, b: a & b, checks)


def bloom_anti_join(
    probe: DataFrame,
    seen: DataFrame,
    probe_key: str,
    seen_key: str | None = None,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """EXACT anti join (probe rows whose key has no match in ``seen``)
    with a Bloom pre-filter: definitely-new rows never shuffle; only
    bitmap hits pay the exact anti join. Equivalent to a plain anti join
    for every input — verified row-identical in tests/test_bloom.py."""
    seen_key = seen_key or probe_key
    words = bloom_build(seen, seen_key, num_bits, num_hashes)
    maybe = bloom_might_contain(words, F.col(probe_key), num_hashes)
    definite_new = probe.filter(~maybe)
    survivors = probe.filter(maybe).join(
        seen.select(F.col(seen_key).alias(probe_key)),
        probe_key,
        "left_anti",
    )
    return definite_new.unionByName(survivors)
