"""Cache-release contract for multi-consumer operators.

Several corpus-tier operators persist a shared subtree (token counts,
signature GEMMs, exploded gram frames) because the returned plan
consumes it more than once — a persist alone is not enough (concurrent
first computations race; see operators/dedup.py), so they materialize
the cache in its own job first. Intermediates consumed entirely inside
the operator are unpersisted before return; caches the RETURNED plan
still references cannot be released inside the operator without
recomputing the subtree once per downstream consumer.

This module makes that residue explicit instead of leaky: operators
attach their plan-feeding caches to the returned DataFrame with
`track_caches`, and callers release them with `release_caches(df)` once
the result has been consumed (written, collected, or checkpointed).
Long-lived sessions (streaming foreachBatch loops, notebook kernels,
the bench harness) MUST call it — otherwise executor storage
accumulates one cached frame per operator call. One-shot jobs can skip
it; the JVM exit releases everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def track_caches(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach persisted dependency frames to `out` for later release.

    Composes: if `out` already carries tracked caches (an operator
    built on another operator's result), the new ones append.
    """
    deps = list(getattr(out, "_cached_deps", ()))
    deps.extend(c for c in cached if c is not None)
    out._cached_deps = deps
    return out


def release_caches(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every cache attached to `df` by `track_caches`.

    Call after the result is consumed. Returns the number of frames
    released; safe on frames that never tracked anything.
    """
    deps = list(getattr(df, "_cached_deps", ()))
    for c in deps:
        c.unpersist(blocking)
    df._cached_deps = []
    return len(deps)
