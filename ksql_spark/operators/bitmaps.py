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


def bitmap_words(df: DataFrame, id_col: str, group_cols: list[str]) -> DataFrame:
    """(group_cols..., word_idx, bits): id sets bit (id % 32) of word
    (id / 32); per-group words merge with bit_or — associative,
    commutative AND idempotent, so the aggregation is map-side partial,
    shard-parallel, and micro-batch-incremental, like any sketch, but
    exact. Popcount-sum the words to read the distinct count back."""
    return (
        df.select(
            *group_cols,
            (F.col(id_col) / BITMAP_WORD).cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST({id_col} % {BITMAP_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy(*group_cols, "word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )
