"""Count-Min Sketch as a DataFrame-native cell table -- the sketched
frequency tier (SURVEY.md section 2.1 #6: the reference's ItemsSketch is
approximate; our exact groupBy tier is stronger at testable scale, but a
100 TB heavy-hitters over unbounded key cardinality needs bounded state).

Design: the sketch is a TABLE of non-empty cells ``(row, cell, cnt)``
rather than a dense opaque binary -- idiomatic Spark because

* update is one narrow explode + groupBy (map-side combined partial
  aggregation; depth x |stream| rows shuffle as 3 longs each);
* merge of any number of sketches is cell-wise ``sum`` -- the same
  groupBy, distributable at any rollup level (the reference merges CMS
  cousins serially, MergeHandler.java:314-328);
* point queries are an equi-join of probe hashes against the cells,
  ``min`` over depth rows (the classic CMS upper-bound estimate:
  estimate >= true count, overestimate bounded by ~2N/width w.h.p.);
* the row hashes are engine-portable md5 arithmetic
  (functions/portable.py), so the DuckDB oracle replays estimates
  bit-identically (q19) -- and so does a resumed job.

Sparse cells cost more per entry than a dense array, but stay exact
under Catalyst partial aggregation and never materialize a
depth x width buffer per group on the driver.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .portable import md5_long60, md5_long60_sql


def cms_hash(item: Column, row: int, width: int) -> Column:
    """Portable hash of `item` into [0, width) for CMS row `row`."""
    return F.pmod(
        md5_long60(F.concat(F.lit(f"cms{row}|"), item.cast("string"))), F.lit(width)
    )


def cms_hash_sql(expr: str, row: int, width: int) -> str:
    inner = f"concat('cms{row}|', CAST({expr} AS VARCHAR))"
    return f"({md5_long60_sql(inner)}) % {width}"


def cms_update(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    group_cols: Sequence[str] = (),
    weight_col: str | None = None,
) -> DataFrame:
    """Stream items into CMS cells: (group..., row, cell, cnt)."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    hashes = F.array(*[cms_hash(F.col(item_col), j, width) for j in range(depth)])
    cells = df.select(
        *group_cols, w.alias("_w"), F.posexplode(hashes).alias("row", "cell")
    )
    return cells.groupBy(*group_cols, "row", "cell").agg(F.sum("_w").alias("cnt"))


def cms_merge(cells: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge any union of CMS cell tables (cell-wise add)."""
    return cells.groupBy(*group_cols, "row", "cell").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cells: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Point-query estimates for the probe items: min over depth rows.
    Items absent from the stream estimate 0 (left join + coalesce)."""
    hashes = F.array(*[cms_hash(F.col(item_col), j, width) for j in range(depth)])
    p = probes.select(
        item_col, *group_cols, F.posexplode(hashes).alias("row", "cell")
    )
    joined = p.join(cells, [*group_cols, "row", "cell"], "left")
    return joined.groupBy(item_col, *group_cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
    )
