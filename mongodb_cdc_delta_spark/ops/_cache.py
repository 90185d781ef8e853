"""Scoped cache registry (r7 ADVICE: persisted-dataset leak).

Several operator pipelines cache an intermediate that feeds multiple
branches of ONE lazily-returned plan (MinHash signatures feeding banding +
estimate, the capped shingle table feeding sizes + both join sides,
PageRank's per-iteration rank table). The cache is correct — but the
function returns a lazy DataFrame, so there is no point inside the
function where the cache can be released, and callers that invoke these
queries repeatedly (the driver, bench warm reps, the parity suite)
accumulated one persisted dataset per call for the session's lifetime.

This registry bounds the live set to one GENERATION per thread:
constructing a new pipeline releases the same thread's previous pipeline's
caches. Sequential callers — every harness we have — run plan N to
completion before building plan N+1, so the release never hits an
in-flight job; an out-of-order caller merely recomputes (Spark falls back
to the lineage when a cache is gone), still correct. Generations are
thread-local so concurrent query threads (the Q8 FAIR-pool bench) never
release each other's caches.
"""

from __future__ import annotations

import functools
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
#: (thread_ident, generation, cached DataFrame)
_REGISTRY: list[tuple[int, int, DataFrame]] = []
_TLS = threading.local()


@contextmanager
def cache_scope():
    """One pipeline generation. Nested scopes (the Jaccard guard's banded
    fallback calls two more caching helpers) share the outermost
    generation via a depth counter, so a pipeline never releases its own
    caches mid-construction."""
    depth = getattr(_TLS, "depth", 0)
    if depth == 0:
        _TLS.gen = getattr(_TLS, "gen", 0) + 1
        _release(thread=threading.get_ident(), before_gen=_TLS.gen)
    _TLS.depth = depth + 1
    try:
        yield
    finally:
        _TLS.depth = depth


def scoped_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` registered under the current thread's generation."""
    df = df.cache()
    with _LOCK:
        _REGISTRY.append(
            (threading.get_ident(), getattr(_TLS, "gen", 0), df)
        )
    return df


def _release(thread: int | None, before_gen: int | None) -> None:
    with _LOCK:
        keep: list[tuple[int, int, DataFrame]] = []
        drop: list[DataFrame] = []
        for t, g, df in _REGISTRY:
            stale = (thread is None or t == thread) and (
                before_gen is None or g < before_gen
            )
            if stale:
                drop.append(df)
            else:
                keep.append((t, g, df))
        _REGISTRY[:] = keep
    for df in drop:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release


def release_all_caches() -> None:
    """Release every cache registered through this module (all threads)."""
    _release(thread=None, before_gen=None)


def cache_scoped(fn):
    """Decorator: run ``fn`` inside a ``cache_scope``."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with cache_scope():
            return fn(*args, **kwargs)

    return wrapper
