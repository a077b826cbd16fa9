"""POSITIONAL JOIN (DuckDB: zip two relations by row position, shorter
side null-padded — reference surface via pass-through SQL,
src/duckdb-backend.ts:142-146).

No distributed engine has an implicit global row order, so the position
key is materialized explicitly with ``rdd.zipWithIndex`` — the standard
distributed enumeration: one count job to learn per-partition sizes,
then each row gets cumulative-offset + local index. No single-partition
window, no shuffle beyond the final position-keyed join. Scan order =
(input split order, row order within split), which matches file order
for parquet scans — the same contract DuckDB's positional semantics
rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _with_pos(df: DataFrame) -> DataFrame:
    schema = T.StructType(
        [T.StructField("__pos", T.LongType(), False), *df.schema.fields]
    )
    rdd = df.rdd.zipWithIndex().map(lambda t: (t[1], *t[0]))
    return df.sparkSession.createDataFrame(rdd, schema)


def positional_join(
    left: DataFrame, right: DataFrame, suffix: str = "_right"
) -> DataFrame:
    """Zip by row position; full-outer on the position key so the longer
    side survives with nulls (DuckDB semantics). Right columns colliding
    with left names come back suffixed."""
    renamed = {
        c: (c + suffix if c in left.columns else c) for c in right.columns
    }
    r = _with_pos(right)
    for old, new in renamed.items():
        if old != new:
            r = r.withColumnRenamed(old, new)
    out = (
        _with_pos(left)
        .join(r, "__pos", "full_outer")
        .orderBy("__pos")
    )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(renamed[c]) for c in right.columns],
    )
