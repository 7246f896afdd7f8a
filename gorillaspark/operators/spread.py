"""Input-widening policy for embarrassingly-parallel Arrow/Python
stages (media decode, simhash signatures, IVF corpus indexing).

These stages have zero cross-row dependency, so the scan partitioning
is the right input at scale — at 100 TB the parquet splits
(maxPartitionBytes) already outnumber the executors and an up-front
repartition would shuffle every payload byte for nothing. Locally the
opposite failure bites: a small corpus is ONE parquet split, which
serializes the whole Python stage on one core (the r6
dedup_simhash_hamming bench regression was exactly this — 0.58 s of a
0.97 s query was the signature mapInArrow running single-task). So:
round-robin repartition ONLY when the input has fewer partitions than
the cluster's parallelism — the same split-vs-shuffle decision AQE
makes for coalescing, applied in the widening direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SPREAD_CACHE: dict = {}


def invalidate() -> None:
    """Drop every memoized widen decision.

    The cache key (analyzed-plan semanticHash) does NOT change when
    files are added to or rewritten under the same input path, so a
    job that rewrites data in place mid-session — maintenance.
    compact_sweep — calls this after a successful rewrite so the next
    stage over that table re-evaluates its partitioning. A stale entry
    is perf-only (a missed widening, or a needless round-robin
    repartition), never a correctness issue."""
    _SPREAD_CACHE.clear()


def spread(df: DataFrame) -> DataFrame:
    if df.isStreaming:      # .rdd is illegal on a stream; micro-batch
        return df           # partitioning is the source's business
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # .rdd.getNumPartitions() forces a full physical planning pass
    # (incl. file listing) — memoize the widen/no-widen decision per
    # analyzed plan so repeated stages over the same input plan only
    # pay it once per process. Staleness under same-path file-set
    # changes is accepted (perf-only); in-place rewrites go through
    # invalidate() above.
    key = (df._jdf.queryExecution().analyzed().semanticHash(), target)
    widen = _SPREAD_CACHE.get(key)
    if widen is None:
        widen = df.rdd.getNumPartitions() < target
        if len(_SPREAD_CACHE) > 256:    # bounded; plans are session-scoped
            _SPREAD_CACHE.clear()
        _SPREAD_CACHE[key] = widen
    return df.repartition(target) if widen else df
