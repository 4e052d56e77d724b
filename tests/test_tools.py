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
    """Every spec NOT in _DRIVER_CERTIFIED must sort before every
    certified one (the gate window samples the first 50, so
    never-certified queries get externally verified first). As of r06
    all 173 are certified — the invariant must still hold structurally,
    and known certification facts stay pinned: ta1_token_stats' r01 row
    was a hash mismatch (not green until its r06 re-pass), a13 got its
    first green in r05."""
    from omfietser_etl_spark.catalog import (
        _CERTIFIED_ROUND,
        _DRIVER_CERTIFIED,
        all_specs,
    )

    assert "a13_approx_distinct" in _DRIVER_CERTIFIED
    # ta1's r01 hash-mismatch must NOT have certified it — its recorded
    # round is the r06 re-pass, proving green() rejects hash_match=False
    assert _CERTIFIED_ROUND.get("ta1_token_stats", 0) >= 6
    specs = all_specs()
    names = [s.name for s in specs]
    first_certified = next(
        (i for i, n in enumerate(names) if n in _DRIVER_CERTIFIED), len(names)
    )
    assert all(n not in _DRIVER_CERTIFIED for n in names[:first_certified])
    assert all(n in _DRIVER_CERTIFIED for n in names[first_certified:])


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


def test_bench_sentinel_shapes_build_and_run(spark):
    """The five frozen host-factor sentinel shapes must stay buildable
    (schema/column drift in testdata would silently break calibration)
    and the data-dependent ones must execute. Heavy synthetic shapes
    (cpu/sort/arrow) are only PLANNED here — their fixed sizes are
    bench-scale by design."""
    import sys

    sys.path.insert(0, ROOT)
    import bench

    shapes = bench._sentinel_shapes()
    assert set(shapes) == set(bench.SENTINEL_REFS)
    sf_dir = "/root/testdata/sf0.001"
    for name, build in shapes.items():
        df = build(spark, sf_dir)
        assert df.columns  # analysis succeeded
        if name in ("io_scan", "shuffle_agg"):
            assert df.collect()  # real data path end-to-end


def test_coverage_ledger_in_sync_with_artifacts():
    """The generated COVERAGE.md certification ledger must agree with a
    from-scratch recomputation over every CORRECTNESS artifact using the
    same green() rule — a stale ledger misleads provenance readers."""
    import glob
    import json
    import re

    mod = _load_update_certified()
    from omfietser_etl_spark.catalog import all_specs

    rows_only = {s.name for s in all_specs() if s.oracle is None}
    earliest, latest = {}, {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            if mod.green(row, name in rows_only):
                latest[name] = max(latest.get(name, 0), rnd)
                earliest.setdefault(name, rnd)

    src = open(os.path.join(ROOT, "COVERAGE.md")).read()
    assert mod.LEDGER_BEGIN in src and mod.LEDGER_END in src
    block = src.split(mod.LEDGER_BEGIN)[1].split(mod.LEDGER_END)[0]
    got = {
        m.group(1): (int(m.group(2)), int(m.group(3)))
        for m in re.finditer(r"\| (\w+) \| r(\d+) \| r(\d+) \|", block)
    }
    want = {n: (earliest[n], latest[n]) for n in latest}
    assert got == want
    assert f"{len(latest)} certified queries." in block
