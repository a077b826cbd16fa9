"""Salted in-query persist (r14 optimization round).

``persist_salted(df)`` caches an intermediate that one query consumes
several times (the window substrate's stats pass + value pass) in
Spark's columnar cache, with two properties a bare ``df.persist()``
does not have:

1. **A unique plan salt per build.** Spark's CacheManager substitutes
   cached data into ANY semantically identical plan, so without the
   salt a REPEATED query (bench min-of-N warm reps, measurement loops)
   silently serves its heavy subtree from the previous rep's still-live
   cache — cross-run result caching, which both poisons measurements
   and violates the compute-from-inputs contract. The ``__sepoch``
   literal makes every build's plan unique; it is dropped right here,
   and the Project above the cached plan still lets every in-query
   consumer share the one materialization.

2. **Retirement.** Superseded entries are unpersisted once more than
   ``_KEEP`` builds are live, so measurement sessions do not accumulate
   dead cached copies (the r14-build leak: every fresh build of the
   window substrate left another ~GB of cache behind).

An RLE'd constant int column costs nothing in the columnar cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LIVE: list = []  # most-recent-first persisted frames
_KEEP = 4  # a single query can hold a few live intermediates
_EPOCH = iter(range(1 << 62))  # unique per-build plan salt


def persist_salted(df: DataFrame) -> DataFrame:
    p = df.withColumn("__sepoch", F.lit(next(_EPOCH))).persist()
    _LIVE.insert(0, p)
    while len(_LIVE) > _KEEP:
        old = _LIVE.pop()
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session torn down — nothing to release
    return p.drop("__sepoch")
