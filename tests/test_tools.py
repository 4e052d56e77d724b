"""Tests for repo tooling (tools/update_certified.py green-row filter)."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_update_certified():
    spec = importlib.util.spec_from_file_location(
        "update_certified", os.path.join(ROOT, "tools", "update_certified.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_green_filter_requires_hash_match():
    """Only rows with rows_match AND schema_match AND hash_match AND no err
    certify a name.

    Regression for two verdict items: (round 4) err rows like a13's
    pre-fix "no_oracle" entries must never certify; (round 5 ADVICE)
    hash_match=False rows (value mismatch with rows/schema green — the
    r01 a4/a7/ta1 shape) must not certify either, or a value-mismatched
    query rotates out of the gate window forever. hash_match=None is
    acceptable only for rows-only-by-design specs (oracle is None).
    """
    mod = _load_update_certified()
    g = mod.green
    base = {"rows_match": True, "schema_match": True, "err": None}
    assert g({**base, "hash_match": True}, rows_only=False)
    assert not g({**base, "hash_match": False}, rows_only=False)
    assert not g({**base, "hash_match": None}, rows_only=False)
    # rows-only-by-design specs have no hash; rows+schema green certifies
    assert g({**base, "hash_match": None}, rows_only=True)
    # ... but an actual hash verdict still wins over the rows-only waiver
    assert not g({**base, "hash_match": False}, rows_only=True)
    # err / rows / schema failures never certify regardless of hash
    assert not g({"rows_match": None, "schema_match": None, "hash_match": None,
                  "err": "no_oracle"}, rows_only=False)
    assert not g({**base, "rows_match": False, "hash_match": True}, rows_only=False)
    assert not g({**base, "schema_match": False, "hash_match": True}, rows_only=False)


def test_driver_certified_fronts_uncertified():
    """ta1_token_stats' only driver row is the r01 hash-mismatch, so the
    regenerated set must leave it out and front it in the gate window
    (its parity bug was fixed later but never driver-re-verified)."""
    from omfietser_etl_spark.catalog import _DRIVER_CERTIFIED, all_specs

    assert "ta1_token_stats" not in _DRIVER_CERTIFIED
    # a13 finally got its green driver row in r05
    assert "a13_approx_distinct" in _DRIVER_CERTIFIED
    specs = all_specs()
    fresh = [s.name for s in specs[:50] if s.name not in _DRIVER_CERTIFIED]
    # every never-certified query fits inside the 50-wide driver window
    assert "ta1_token_stats" in fresh
    assert len([s for s in specs if s.name not in _DRIVER_CERTIFIED]) <= 50


def test_staleness_rotation_orders_certified_tail_oldest_first():
    """The certified tail is ordered by (latest green round, name) so the
    50-wide gate window re-verifies the whole catalog every ~3 rounds
    instead of re-sampling the same prefix forever. Order must be fully
    deterministic (name tiebreak within a round)."""
    from omfietser_etl_spark.catalog import (
        _CERTIFIED_ROUND,
        _DRIVER_CERTIFIED,
        all_specs,
    )

    specs = all_specs()
    tail = [s for s in specs if s.name in _DRIVER_CERTIFIED]
    keys = [(_CERTIFIED_ROUND.get(s.name, 0), s.name) for s in tail]
    assert keys == sorted(keys)
    # two identical calls produce the identical order (pure function of
    # the committed tables — no runtime artifact IO)
    assert [s.name for s in all_specs()] == [s.name for s in specs]
    # the rotation actually rotates: the window is NOT dominated by the
    # most recently certified round
    newest = max(_CERTIFIED_ROUND.values())
    window = specs[:50]
    assert all(
        _CERTIFIED_ROUND.get(s.name, 0) < newest for s in window
    ), "gate window should hold only stale (or fresh-uncertified) queries"
