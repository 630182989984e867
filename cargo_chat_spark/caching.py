"""Per-(session, key) memo for persisted DataFrame subtrees.

Repeated catalog runs (bench loops, oracle harness, REPL) would otherwise
stack fresh cached RDDs until the ContextCleaner happens to GC them
(ADVICE r1). One entry per key; invalidated when the owning SparkSession
changes (keyed by applicationId) or when the underlying parquet data
changes (ADVICE r2: any str key element that is an existing path is
fingerprinted by file names/sizes/mtimes, so rewriting a fixture dir
in-session gets a fresh build instead of a stale cache).

A persist() boundary is also the supported way to SPLIT a whole-stage
codegen unit: a fused Project+HashAggregate whose generated method exceeds
Janino's 64 KB limit silently falls back to interpreted evaluation for the
whole stage (ERROR CodeGenerator → WholeStageCodegenExec disabled). An
InMemoryTableScan in between gives each side its own (small) codegen unit.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_PERSIST_MEMO: dict = {}

# Other modules' session-scoped memo dicts (e.g. the trained-IVF
# (DataFrame, centroids) cache) register here so invalidate_all() can give
# a genuinely cold start — bench --repeat N must not let repeat 2 reuse
# repeat 1's persisted subtrees when the driver's real run is single-shot.
_EXTRA_MEMOS: list[dict] = []


def register_memo(d: dict) -> None:
    _EXTRA_MEMOS.append(d)


def _stat_sig(path: str) -> tuple:
    st = os.stat(path)
    return (os.path.basename(path), st.st_size, st.st_mtime_ns)


def _path_fingerprint(path: str) -> tuple:
    """(name, size, mtime_ns) of a data file, or of every entry one level
    under a directory (covers both single-file parquet fixtures and
    directory-style parquet sinks). Cheap: one listdir + one stat per file,
    driver-side, once per memo lookup."""
    if os.path.isfile(path):
        return (_stat_sig(path),)
    sigs = []
    for name in sorted(os.listdir(path)):
        p = os.path.join(path, name)
        try:
            if os.path.isfile(p):
                sigs.append(_stat_sig(p))
            else:
                inner = os.listdir(p)
                sigs.append((name, len(inner), os.stat(p).st_mtime_ns))
        except OSError:
            continue
    return tuple(sigs)


def _key_fingerprint(key) -> tuple:
    parts = key if isinstance(key, tuple) else (key,)
    fps = []
    for part in parts:
        if isinstance(part, str) and os.path.exists(part):
            try:
                fps.append(hash(_path_fingerprint(part)))
            except OSError:
                fps.append(None)
    return tuple(fps)


def _sweep_dead_sessions(current_app_id: str) -> None:
    """Drop entries owned by stopped SparkSessions — otherwise a process
    that restarts sessions (pytest suites, REPL reconnects) accumulates
    unreachable DataFrame handles forever."""
    for k in list(_PERSIST_MEMO):
        if k[0] == current_app_id:
            continue
        df = _PERSIST_MEMO[k]
        try:
            stopped = df.sparkSession._jsparkSession.sparkContext().isStopped()
        except Exception:
            stopped = True
        if stopped:
            del _PERSIST_MEMO[k]


def memo_persist(
    spark: SparkSession, key, build: Callable[[], DataFrame]
) -> DataFrame:
    app_id = spark.sparkContext.applicationId
    k = (app_id, key, _key_fingerprint(key))
    df = _PERSIST_MEMO.get(k)
    if df is None:
        _sweep_dead_sessions(app_id)
        # a stale twin (same logical key, different data fingerprint) is
        # dead weight — unpersist it now rather than waiting for GC
        for old in [o for o in _PERSIST_MEMO if o[:2] == (app_id, key)]:
            try:
                _PERSIST_MEMO.pop(old).unpersist()
            except Exception:
                pass
        df = build().persist()
        _PERSIST_MEMO[k] = df
    return df


def invalidate(key=None) -> None:
    """Unpersist + drop memo entries matching ``key`` (all entries when
    None), across every registered memo dict."""
    for k in list(_PERSIST_MEMO):
        if key is not None and k[1] != key:
            continue
        try:
            _PERSIST_MEMO.pop(k).unpersist()
        except Exception:
            pass
    for d in _EXTRA_MEMOS:
        for k in list(d):
            if key is not None and (k[1] if isinstance(k, tuple) and len(k) > 1 else k) != key:
                continue
            entry = d.pop(k)
            for item in entry if isinstance(entry, tuple) else (entry,):
                if isinstance(item, DataFrame):
                    try:
                        item.unpersist()
                    except Exception:
                        pass


def invalidate_all() -> None:
    invalidate(None)
