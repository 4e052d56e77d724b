"""Scoped cache registry: persisted intermediates that outlive their
builder function (they back a returned lazy DataFrame) but must not
outlive the NEXT invocation.

Operators that persist fan-out intermediates (dedup pair producers,
the corpus-prep pipeline) register them under a scope; each new call
releases the previous call's frames first. Repeated catalog runs —
the 106-query gate executes many of these back to back — otherwise
accumulate cached partitions in the executors (the pressure that
once forced the bench driver heap to 8g).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPES: dict[str, list[DataFrame]] = {}


def register(scope: str, df: DataFrame) -> DataFrame:
    """Track a persisted frame under ``scope``; returns it unchanged."""
    _SCOPES.setdefault(scope, []).append(df)
    return df


def release(scope: str) -> None:
    """Unpersist every frame registered under ``scope``. Safe to call
    any time — later actions on previously returned frames recompute."""
    for df in _SCOPES.pop(scope, []):
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass


def release_then_register(scope: str, df: DataFrame) -> DataFrame:
    """Release the scope's PREVIOUS frames, then register ``df`` —
    the self-cleaning pattern for once-per-invocation persists."""
    release(scope)
    return register(scope, df)
