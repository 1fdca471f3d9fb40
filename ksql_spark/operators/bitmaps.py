"""Bitmap-word encoding for EXACT mergeable distinct counting
(SURVEY.md §2 D15/I13/I14 [EXT]) — the RoaringBitmap pattern for
dictionary-bounded id domains.

One spelling of the word/mask convention, shared by agg_bitmap_distinct,
events_cumulative_users, events_rolling_wau, and the property-law tests —
so a change to the word width or the sign-bit rule happens in exactly one
place (bloom_sketch/cms_sketch set the same precedent for the hash
sketches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: bits used per BIGINT word — 32, so the sign bit is never touched
#: (DuckDB's `<<` on a BIGINT sign bit is the hazard this sidesteps;
#: oracles spell the same 32-bit packing).
BITMAP_WORD = 32

#: log2(BITMAP_WORD) — word_idx is an arithmetic shiftright, which IS
#: floor division on longs (exact for the full 64-bit range, no
#: double-precision detour, and correct for negative ids where
#: truncate-toward-zero `/` would collide -1..-31 with 0..31).
_WORD_SHIFT = BITMAP_WORD.bit_length() - 1
assert 1 << _WORD_SHIFT == BITMAP_WORD, "BITMAP_WORD must be a power of two"


def bitmap_words(df: DataFrame, id_col: str, group_cols: list[str]) -> DataFrame:
    """(group_cols..., word_idx, bits): id sets bit pmod(id, 32) of word
    floor(id / 32); per-group words merge with bit_or — associative,
    commutative AND idempotent, so the aggregation is map-side partial,
    shard-parallel, and micro-batch-incremental, like any sketch, but
    exact. Popcount-sum the words to read the distinct count back.

    Negative ids are a correct, distinct part of the domain (ADVICE r5):
    pmod keeps the bit index in 0..31 (Spark `%` would keep the sign and
    shiftleft's 6-bit shift mask would then touch bit 63, the sign bit),
    and floor division sends id=-1 to word -1 bit 31 — a bijection over
    all of BIGINT, so negative ids never collide with positive ones."""
    return (
        df.select(
            *group_cols,
            F.shiftright(F.col(id_col).cast("long"), _WORD_SHIFT).alias(
                "word_idx"
            ),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pmod({id_col}, {BITMAP_WORD}) AS INT))"
            ).alias("mask"),
        )
        .groupBy(*group_cols, "word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )
