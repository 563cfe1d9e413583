"""Persist lifecycle for multi-consumer intermediates.

Several operators persist() an intermediate that downstream stages
consume more than once (LSH signatures, candidate-pair sets — without
the persist the whole upstream DAG re-executes per consumer, measured
3.8x on the q31 verify join). Those persists are correct for one-shot
queries but, because the returned DataFrame is lazy, the operator
cannot unpersist before the CALLER runs an action — so in a long-lived
session they accumulate in executor storage.

Contract: operators register every internal persist() here via
``scoped_persist``; callers release them with ``release_caches()``
after materializing the result (collect/write/count). A released cache
only costs recomputation if the same DataFrame is re-executed later —
the data itself is never lost (persist is a performance hint, not a
correctness mechanism). bench.py releases between query attempts and
the tests pin the zero-leftover invariant; LONG-LIVED CALLERS (a
driver looping over queries, a service session) own the release —
call ``release_caches()`` after materializing, or wrap the work in
``cache_scope()``:

    with cache_scope():
        minhash_lsh_pairs(sigs).write.parquet(out)   # caches live here
    # caches released
"""

from __future__ import annotations

from contextlib import contextmanager

_SCOPED: list = []


def scoped_persist(df, storage_level=None, eager=False):
    """persist() a DataFrame and register it for release_caches().

    eager=True additionally populates the cache NOW with one count()
    job. Rationale (measured on q31 at sf1.0, local[32]): persist() is
    lazy, and under AQE every consumer of the cached frame becomes an
    independent shuffle/broadcast stage future that the scheduler
    launches CONCURRENTLY — each future finds the cache unpopulated and
    recomputes the whole upstream DAG (stage metrics showed the LSH
    signature pipeline executed 3x and the candidate-pair DAG 2-3x
    inside one action; ~60% of q31's wall time). One small count()
    (the cache build itself, which had to happen anyway) serializes the
    population, after which every consumer reads InMemoryTableScan.
    Use for intermediates with 2+ sibling consumers in the SAME action;
    leave lazy when consumers run in sequential actions (iterative
    loops) where the first action populates naturally."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    if eager:
        df.count()
    _SCOPED.append(df)
    return df


def release_one(df) -> None:
    """Unpersist ONE scoped cache and drop its registry entry — for
    operators that supersede an intermediate mid-loop (iterative
    algorithms): plain ``df.unpersist()`` would leave a dead handle in
    the registry until the next release_caches()."""
    try:
        df.unpersist()
    except Exception:
        pass
    try:
        _SCOPED.remove(df)
    except ValueError:
        pass


def release_caches() -> int:
    """Unpersist every registered cache (newest first). Returns the
    number released. Safe to call repeatedly / with nothing cached."""
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n


@contextmanager
def cache_scope():
    """Context manager: release all caches registered inside the block."""
    mark = len(_SCOPED)
    try:
        yield
    finally:
        while len(_SCOPED) > mark:
            df = _SCOPED.pop()
            try:
                df.unpersist()
            except Exception:
                pass
