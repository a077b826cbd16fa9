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
   window substrate left another ~GB of cache behind). Callers that
   KNOW a substrate is dead (e.g. the group-broadcast route's budget
   fallback) should ``release_salted`` it immediately instead of
   waiting for four later builds to push it out.

**Consistency contract (r14 ADVICE).** Retirement is count-based, not
query-scoped: a single query building more than ``_KEEP`` substrates
(nested with_row_numbers for dense_rank + ragg group tables in one
mixed clause) would unpersist a substrate still referenced by a later
pass of the same query. That later pass then RECOMPUTES from lineage —
correct in local mode and on any cluster while the shuffle files
backing the substrate's exchange survive, because the substrate plans
are deterministic (range partition + sort of deterministic input;
``__pid``/``__mid`` derive from the sort, not from ``rand()``). Under
executor loss WITH shuffle-file loss the recompute re-runs the range
partitioner's SAMPLING job, which may draw different split points —
``__pid``/``__mid`` consistency across passes is then NOT guaranteed.
Deployments that need that guarantee should raise ``_KEEP`` to the
query's substrate count or checkpoint the substrate to reliable
storage; the engine's local/driver contract (one process, retained
shuffle files) is covered by the default.

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
    out = p.drop("__sepoch")
    # handle for release_salted: the returned frame is a Project above
    # the persisted one, so the caller cannot unpersist it directly
    out._salted_source = p
    return out


def release_salted(df: DataFrame) -> None:
    """Immediately unpersist a frame returned by :func:`persist_salted`
    and drop it from the retirement queue (r14 ADVICE: the group-
    broadcast route's budget fallback abandons its group table — without
    an eager release the dead cache entry lingers until 4 later builds
    retire it)."""
    p = getattr(df, "_salted_source", None)
    if p is None:
        return
    try:
        p.unpersist(blocking=False)
    except Exception:
        pass  # session torn down — nothing to release
    try:
        _LIVE.remove(p)
    except ValueError:
        pass  # already retired by the _KEEP queue
