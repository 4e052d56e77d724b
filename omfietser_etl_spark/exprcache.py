"""Process-level memo for expensive unresolved Column trees.

Building a big expression from Column objects costs one Py4J round
trip PER OPERATOR — the promotion parser alone is ~2500 JVM calls
(~0.9 s of socket latency on every invocation, measured), and the
pipeline cascade repeats such builders for every query construction.
Unresolved Columns are immutable and freely reusable across
DataFrames and queries (storing them in module constants is standard
Spark practice), so builders over FIXED column names can construct
once per process and hand out the same tree.

Cache keys include a gateway EPOCH — a module counter bumped whenever
the live Py4J gateway object changes identity: a stopped/restarted
JVM invalidates every cached `_jc` handle, so entries from another
gateway are dropped on first miss rather than handed out dead. An
epoch (tracked via a weakref to the gateway) rather than ``id(gw)``,
because after a restart the old gateway can be garbage-collected and
the new one allocated at the same address — id() would collide and
serve dead handles; a dead weakref cannot.

Only memoize builders whose output depends on nothing but constants
and fixed column names — never on a DataFrame, SparkSession state,
or builder arguments that vary per call site (put varying arguments
into the key).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column

_MEMO: dict[tuple, Column | dict | list] = {}

# gateway-identity tracking: _gw_ref holds a weakref to the gateway
# seen last; when the current gateway is a DIFFERENT object (including
# the old one being dead — same-address reallocation), bump the epoch.
_gw_ref = None
_gw_epoch = 0


def _gateway_epoch() -> int | None:
    global _gw_ref, _gw_epoch
    import weakref

    from pyspark import SparkContext

    gw = getattr(SparkContext, "_gateway", None)
    if gw is None:
        return None
    seen = _gw_ref() if _gw_ref is not None else None
    if seen is not gw:
        _gw_epoch += 1
        try:
            _gw_ref = weakref.ref(gw)
        except TypeError:  # non-weakref-able gateway: pin it instead
            _gw_ref = lambda g=gw: g
    return _gw_epoch


def column_memo(key: tuple, build: Callable[[], Column | dict | list]):
    """Return the memoized result of ``build()`` for ``key`` under
    the current JVM gateway; values may be a Column, or a dict/list
    of Columns (for ``withColumns``/``select`` call sites)."""
    full = (_gateway_epoch(), *key)
    if full not in _MEMO:
        # drop entries from dead gateways so handles never go stale
        for stale in [k for k in _MEMO if k[0] != full[0]]:
            del _MEMO[stale]
        _MEMO[full] = build()
    return _MEMO[full]
