"""Data-layout operators: space-filling-curve keys for multi-dimensional
file clustering.

At 10^12 rows the dominant read cost is which FILES a predicate touches,
not which rows: an Iceberg/parquet table sorted by a single column prunes
ranges on that column only, while a rectangle predicate over two columns
(host × document length, language × timestamp) reads almost everything.
Interleaving the dimensions' bits into one Z-order key before the
write-time sort clusters both dimensions at once — the standard layout
optimization (Morton order; `OPTIMIZE ZORDER BY` in lakehouse engines) —
and the audit operator below MEASURES the benefit on a concrete
rectangle instead of asserting it.

Everything is exact integer bit arithmetic (shifts + masks, no hashing
beyond the md5 host bucket, no floats), so the DuckDB twin replays the
identical expression and the artifacts are bit-identical cross-engine.

No reference counterpart (the reference's outputs are O(10^2) local JSON
files, /root/reference/project/main.py); this tier exists for the
web-scale table the engine targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits kept per dimension; the interleaved key is 2*ZBITS wide.
ZBITS = 16


def zorder_key(d1: Column, d2: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two non-negative ``bits``-wide longs: d1's bit
    j lands at position 2j+1, d2's at 2j — one unrolled codegen
    expression of shifts/masks (2·bits terms), no loop state, exact."""
    key = F.lit(0).cast("long")
    for j in range(bits):
        key = (key
               .bitwiseOR(F.shiftleft(
                   F.shiftright(d1, j).bitwiseAND(F.lit(1)), 2 * j + 1))
               .bitwiseOR(F.shiftleft(
                   F.shiftright(d2, j).bitwiseAND(F.lit(1)), 2 * j)))
    return key


def sql_zorder_key(d1: str, d2: str, bits: int = ZBITS) -> str:
    """The identical interleave as DuckDB SQL text (twin device)."""
    terms = []
    for j in range(bits):
        terms.append(f"((({d1} >> {j}) & 1) << {2 * j + 1})")
        terms.append(f"((({d2} >> {j}) & 1) << {2 * j})")
    return " | ".join(terms)


def doc_layout_dims(source: Column, n_chars: Column) -> tuple[Column, Column]:
    """The two clustering dimensions for the documents table: a 16-bit
    md5 host bucket (uniform, order-free — hosts have no natural order)
    and the character length clamped to 16 bits."""
    d1 = F.conv(F.substring(F.md5(source), 1, 4), 16, 10).cast("long")
    d2 = F.least(F.coalesce(n_chars.cast("long"), F.lit(0)),
                 F.lit((1 << ZBITS) - 1))
    return d1, d2


def zorder_prune_audit(df: DataFrame, d1_lo: int, d1_hi: int,
                       d2_lo: int, d2_hi: int,
                       file_shift: int = 18) -> DataFrame:
    """Measure file pruning for a rectangle predicate under two layouts:
    Z-order vs linear concatenation (d1 * 2^16 + d2). A "file" is an
    equal-width key-prefix range (``key >> file_shift`` — the shape a
    range-partitioned write produces); for each layout the audit reports
    how many files exist, how many a reader must touch for the
    rectangle, and the touched fraction. Zero corpus shuffle until the
    final tiny groupBy over (layout, file): the projection (two keys +
    the predicate) is one codegen pass, and the aggregate's key space is
    bounded by 2·2^(32-file_shift)."""
    d1, d2 = doc_layout_dims(F.col("source"), F.col("n_chars"))
    zkey = zorder_key(d1, d2)
    lkey = F.shiftleft(d1, ZBITS) + d2
    matched = (d1.between(d1_lo, d1_hi)
               & d2.between(d2_lo, d2_hi)).alias("matched")
    tagged = df.select(
        matched,
        F.explode(F.array(
            F.struct(F.lit("zorder").alias("layout"),
                     F.shiftright(zkey, file_shift).alias("file")),
            F.struct(F.lit("linear").alias("layout"),
                     F.shiftright(lkey, file_shift).alias("file"))))
        .alias("lf"))
    return (tagged
            .groupBy(F.col("lf.layout").alias("layout"))
            .agg(F.countDistinct("lf.file").alias("files_total"),
                 F.countDistinct(
                     F.when(F.col("matched"), F.col("lf.file")))
                 .alias("files_touched"),
                 F.sum(F.when(F.col("matched"), 1).otherwise(0))
                 .cast("long").alias("rows_matched"))
            .withColumn(
                "touched_frac",
                F.col("files_touched").cast("double")
                / F.col("files_total").cast("double")))
