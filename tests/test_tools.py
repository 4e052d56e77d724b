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
    """The certified tail is a RE-VERIFY block (queries whose code was
    touched after their latest green — round-13 verdict item 7)
    followed by the staleness rotation, each internally ordered by
    (latest green round, name). Order must be fully deterministic
    (name tiebreak within a round)."""
    from omfietser_etl_spark.catalog import (
        _CERTIFIED_ROUND,
        _DRIVER_CERTIFIED,
        _RETOUCHED_AFTER_GREEN,
        all_specs,
    )

    specs = all_specs()
    active_retouch = {
        n for n, pin in _RETOUCHED_AFTER_GREEN.items()
        if n in _DRIVER_CERTIFIED and _CERTIFIED_ROUND.get(n, 0) <= pin
    }
    tail = [s for s in specs if s.name in _DRIVER_CERTIFIED]
    front = [s for s in tail if s.name in active_retouch]
    rest = [s for s in tail if s.name not in active_retouch]
    # the retouch block leads the certified tail, both blocks sorted
    assert tail[: len(front)] == front, "retouched queries must front the tail"
    for block in (front, rest):
        keys = [(_CERTIFIED_ROUND.get(s.name, 0), s.name) for s in block]
        assert keys == sorted(keys)
    # two identical calls produce the identical order (pure function of
    # the committed tables — no runtime artifact IO)
    assert [s.name for s in all_specs()] == [s.name for s in specs]
    # the rotation actually rotates: beyond the re-verify block, the
    # window is NOT dominated by the most recently certified round
    newest = max(_CERTIFIED_ROUND.values())
    window = specs[:50]
    assert all(
        _CERTIFIED_ROUND.get(s.name, 0) < newest or s.name in active_retouch
        for s in window
    ), "gate window should hold only stale, retouched, or fresh queries"


def test_bench_refs_pinned_to_current_catalog():
    """SENTINEL_REFS are valid only for the catalog composition they
    were measured against (round-7 ADVICE: the END-battery arrow axis
    encodes Python-worker daemon state accumulated over the CURRENT
    catalog — 1.6 s fresh vs 4.6 s after the battery). Adding or
    removing queries must force a re-pin: re-measure the END battery
    on a clean window, then update SENTINEL_REFS and
    SENTINEL_REF_CATALOG together in bench.py."""
    import sys

    sys.path.insert(0, ROOT)
    import bench
    from omfietser_etl_spark.catalog import all_specs

    fp = bench.catalog_fingerprint(s.name for s in all_specs())
    assert fp == bench.SENTINEL_REF_CATALOG, (
        "catalog composition changed since SENTINEL_REFS were pinned — "
        "re-measure the END battery on a clean window and re-pin "
        f"SENTINEL_REFS + SENTINEL_REF_CATALOG (now {fp!r}) together"
    )


def test_bench_comparable_gate():
    """comparable=True only when refs are fresh AND the window's load
    was even (host_spread <= 1.3) — the r06 1.47-spread window would
    have been auto-flagged (round-7 verdict item 5)."""
    import sys

    sys.path.insert(0, ROOT)
    import bench

    assert bench.comparable(1.0, refs_stale=False)
    assert bench.comparable(bench.COMPARABLE_SPREAD_MAX, refs_stale=False)
    assert not bench.comparable(1.47, refs_stale=False)  # the r06 window
    assert not bench.comparable(1.0, refs_stale=True)
    # fingerprint is order-insensitive and composition-sensitive
    assert bench.catalog_fingerprint(["b", "a"]) == bench.catalog_fingerprint(["a", "b"])
    assert bench.catalog_fingerprint(["a"]) != bench.catalog_fingerprint(["a", "b"])


def test_bench_retry_decision():
    """The single bounded retry (round-11 verdict item 3) fires ONLY
    on the era-pollution signature: first attempt, host_factor above
    1.2, and a first window cheap enough that a second fits the
    driver's budget. Never on later attempts (bounded), never on a
    clean factor (a spread-only flag is the documented false-positive
    direction), never after a blown budget."""
    import sys

    sys.path.insert(0, ROOT)
    import bench

    # the r11 official window: hf 1.247, ~280 s — retry fires
    assert bench.should_retry(1.247, attempt=0, total_sec=280.0)
    # clean-era factor: no retry even if the window self-flags on spread
    assert not bench.should_retry(1.0, attempt=0, total_sec=280.0)
    assert not bench.should_retry(bench.RETRY_HOST_FACTOR, attempt=0, total_sec=280.0)
    # bounded: one retry max
    assert not bench.should_retry(1.5, attempt=1, total_sec=280.0)
    # budget: don't double a window that already ran long
    assert not bench.should_retry(1.5, attempt=0, total_sec=1200.0)
    assert bench.should_retry(1.21, attempt=0, total_sec=bench.RETRY_BUDGET_SEC)


def test_driver_sim_chunk_assignment_covers_all_once():
    """Striped chunking must place EVERY query in EXACTLY one chunk for
    any chunk count (a dropped or doubled query would silently weaken
    or skew a sweep), and actually stripe (round-8: contiguous slices
    packed the heavy families into one chunk and OOM'd the 1g heap)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "driver_sim", os.path.join(ROOT, "tools", "driver_sim.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    names = [f"q{i}" for i in range(176)]
    for n in (1, 2, 4, 7, 8, 176, 300):
        chunks = mod.chunk_assignment(names, n)
        flat = [x for c in chunks for x in c]
        assert sorted(flat) == sorted(names), n  # exactly-once coverage
        sizes = [len(c) for c in chunks if c]
        assert max(sizes) - min(sizes) <= 1, n  # balanced
    # striping: adjacent rotation entries land in different chunks
    c8 = mod.chunk_assignment(names, 8)
    assert names[0] in c8[0] and names[1] in c8[1]


def test_bench_trend_epochs_and_diff(tmp_path):
    """bench_trend groups history rows into catalog-composition epochs
    (consecutive; a repeated composition later = a NEW epoch), picks
    each epoch's lowest-raw window, and diffs the last two epochs'
    best windows on the shared queries with added/removed named."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "bench_trend", os.path.join(ROOT, "tools", "bench_trend.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rows = [
        {"value": 10.0, "queries": {"a": 4.0, "b": 6.0},
         "comparable": True, "value_normalized": 9.0},
        {"value": 8.0, "queries": {"a": 3.0, "b": 5.0},    # epoch-1 best
         "comparable": False, "value_normalized": 5.5},    # flagged: norm ignored
        {"value": 9.5, "queries": {"a": 2.0, "b": 6.0, "c": 1.5}},  # epoch 2
        {"queries": {"a": 3.5, "b": 3.5}},  # repeat -> epoch 3; total derived
        {"value": 1.0},                                     # no detail: skipped
    ]
    hist = tmp_path / "hist.jsonl"
    hist.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    epochs = mod.load_epochs(str(hist))
    assert [len(e["key"]) for e in epochs] == [2, 3, 2]
    assert [e["best"]["value"] for e in epochs] == [8.0, 9.5, 7.0]
    assert epochs[0]["windows"] == 2
    # comparable-awareness: epoch 1 has ONE clean window and its
    # normalized best comes from that window, never the flagged one
    assert epochs[0]["clean_windows"] == 1
    assert epochs[0]["best_norm"] == 9.0
    assert epochs[1]["clean_windows"] == 0 and epochs[1]["best_norm"] is None

    lines = mod.diff_best(epochs[-2]["best"], epochs[-1]["best"], top_n=5)
    assert "shared 2 queries" in lines[0]
    assert "removed: c" in lines[0]
    assert any("| b | 6.00 | 3.50 | -2.50 |" in ln for ln in lines)


def test_driver_sim_argv_validation():
    """--chunks without a positive integer prints usage (rc 2, no
    traceback); unknown query names error instead of silently running
    a vacuous green sweep (round-7 ADVICE)."""
    import subprocess
    import sys

    tool = os.path.join(ROOT, "tools", "driver_sim.py")
    for argv in (["--chunks"], ["--chunks", "abc"], ["--chunks", "0"]):
        r = subprocess.run(
            [sys.executable, tool, *argv], capture_output=True, text=True
        )
        assert r.returncode == 2, (argv, r.stderr)
        assert "usage:" in r.stderr
    r = subprocess.run(
        [sys.executable, tool, "--chunks", "2", "/root/testdata/sf0.01",
         "no_such_query_xyz"],
        capture_output=True, text=True,
    )
    assert r.returncode == 2
    assert "no_such_query_xyz" in r.stderr


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


def _recompute_ledger(mod):
    """From-scratch (earliest, latest) green rounds per query over every
    CORRECTNESS artifact, using the tool's own green() rule. Round
    numbers are PARSED and min/max'd symmetrically — never dependent on
    lexical glob order (round-7 ADVICE: r100 sorts before r99)."""
    import glob
    import json
    import re

    from omfietser_etl_spark.catalog import all_specs

    rows_only = {s.name for s in all_specs() if s.oracle is None}
    earliest, latest = {}, {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            if mod.green(row, name in rows_only):
                latest[name] = max(latest.get(name, 0), rnd)
                earliest[name] = min(earliest.get(name, rnd), rnd)
    return earliest, latest


def _parse_ledger(mod):
    import re

    src = open(os.path.join(ROOT, "COVERAGE.md")).read()
    assert mod.LEDGER_BEGIN in src and mod.LEDGER_END in src
    block = src.split(mod.LEDGER_BEGIN)[1].split(mod.LEDGER_END)[0]
    return block, {
        m.group(1): (int(m.group(2)), int(m.group(3)))
        for m in re.finditer(r"\| (\w+) \| r(\d+) \| r(\d+) \|", block)
    }


def test_coverage_ledger_internally_consistent():
    """Engine-invariant half (round-7 verdict item 2): the committed
    ledger block itself must be well-formed — paired markers, count
    line agreeing with the table, earliest <= latest everywhere, and
    _DRIVER_CERTIFIED/_CERTIFIED_ROUND agreeing with the ledger's
    latest column. Always green on a fresh clone, regardless of any
    CORRECTNESS artifact the driver wrote after the last refresh."""
    mod = _load_update_certified()
    from omfietser_etl_spark.catalog import _CERTIFIED_ROUND, _DRIVER_CERTIFIED

    block, got = _parse_ledger(mod)
    assert got, "ledger table is empty"
    assert f"{len(got)} certified queries." in block
    assert all(first <= last for first, last in got.values())
    assert set(got) == set(_DRIVER_CERTIFIED)
    assert {n: r for n, (_, r) in got.items()} == dict(_CERTIFIED_ROUND)


def test_coverage_ledger_in_sync_with_artifacts():
    """Artifact-freshness half: the ledger must agree with a
    from-scratch recomputation over every CORRECTNESS artifact. When
    the ONLY divergence is a driver artifact NEWER than anything the
    ledger records (the normal start-of-round state), this SKIPS with
    the refresh command instead of failing — a fresh clone with a
    brand-new CORRECTNESS_rNN.json fails no engine test, but the
    demand to refresh stays loud. Any other divergence is a real
    inconsistency and fails."""
    import pytest

    mod = _load_update_certified()
    earliest, latest = _recompute_ledger(mod)
    _, got = _parse_ledger(mod)
    want = {n: (earliest[n], latest[n]) for n in latest}
    if got == want:
        return
    max_ledger_round = max(r for _, r in got.values())
    diverging = {n for n in set(got) | set(want) if got.get(n) != want.get(n)}
    # Pure staleness = per name, the recomputation only ADDS greens the
    # ledger predates: a known name's latest strictly grew (with its
    # first-green unchanged), or a name is newly green at any round —
    # including the SAME round as the ledger max (the driver re-runs
    # within a round after a mid-round refresh; round-8 review item).
    only_newer = (
        set(got) <= set(want)
        and all(
            want[n][1] > got[n][1] if n in got else True for n in diverging
        )
        and all(got[n][0] == want[n][0] for n in diverging if n in got)
    )
    if only_newer:
        pytest.skip(
            f"ledger stale: CORRECTNESS greens newer than the r{max_ledger_round:02d} "
            "ledger exist — run `python tools/update_certified.py` (the documented "
            "first command of every round) and commit"
        )
    assert got == want, f"ledger inconsistent beyond freshness: {sorted(diverging)}"


def _load_bounded_sf1():
    spec = importlib.util.spec_from_file_location(
        "bounded_sf1", os.path.join(ROOT, "tools", "bounded_sf1.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bounded_staged_graph_sql_equals_gate_oracle():
    """The staged-replay bounded checks (tools/bounded_sf1.py, round-11
    verdict ask #3) must be SEMANTICALLY IDENTICAL to the gate oracles
    — they exist to make the 10x replay affordable (materialize the
    shared edge table once), never to weaken it. Pure DuckDB: run the
    gate oracle and the staged variant on the same sf0.01 views and
    assert frame equality for all five graph queries."""
    from omfietser_etl_spark.catalog import all_specs
    from omfietser_etl_spark.parity import duck_connect

    from .conftest import SF_CORRECT

    mod = _load_bounded_sf1()
    specs = {s.name: s for s in all_specs()}
    staged_names = [n for n, (kind, _) in mod.CHECKS.items() if kind == "staged"]
    assert sorted(staged_names) == [
        "g2_triangle_count", "g4_kcore", "g5_label_propagation",
        "g6_hits", "g7_modularity",
    ]
    import re

    con = duck_connect(SF_CORRECT)
    try:
        for name in staged_names:
            gate = con.execute(specs[name].oracle).df()
            sql = mod.staged_sql(con, name)
            # the _materialize_ctes rewrite is safe only while every
            # `<word> AS (` in the builders' output is a CTE head —
            # pin that invariant here (see its docstring)
            assert not re.search(r"\bAS \((?!SELECT)", sql.replace(
                "AS MATERIALIZED (", "AS (")), name
            staged = con.execute(sql).df()
            cols = sorted(gate.columns)
            assert cols == sorted(staged.columns), name
            a = gate[cols].sort_values(cols).reset_index(drop=True)
            b = staged[cols].sort_values(cols).reset_index(drop=True)
            assert a.equals(b), f"{name}: staged replay diverges from gate oracle"
            assert len(a) > 0 or name == "g4_kcore", name  # g4's 0 rows is correct
    finally:
        con.close()


def test_bounded_slice_checks_pass_at_gate_scale(spark):
    """EVERY endpoint-slice and df-guard-hybrid bounded check must
    agree with the engine at gate scale (round-11 ADVICE: only
    td2/td12 were pinned before — a silently vacuous or diverging
    sliced path on td2h/td5/td16/mm8 at 10x would have gone
    unnoticed). k=MOD makes the slice the identity (engine unfiltered
    vs unchanged gate oracle — non-vacuous by construction); the
    partial k exercises the real sliced path BOTH sides and must also
    be non-vacuous — the corpus is deterministic, so the pinned
    partial k per query guarantees surviving in-slice pairs."""
    from .conftest import SF_CORRECT

    mod = _load_bounded_sf1()
    sliced = sorted(
        n for n, (kind, _k) in mod.CHECKS.items() if kind in ("slice", "hybrid")
    )
    assert len(sliced) == 7, f"CHECKS slice/hybrid census drifted: {sliced}"
    # td16's gate output is the sparsest pair set (quadratic shrink
    # empties it below ~2/3 of the id space at sf0.01) — its pinned
    # partial k is wider so the sliced path stays non-vacuous.
    partial_k = {"td16_rh_lsh_pairs": 64}
    for name in sliced:
        for k in (mod.MOD, partial_k.get(name, 48)):
            r, label, _secs = mod.run_check(spark, SF_CORRECT, name, k_override=k)
            assert r.ok, f"{name} [{label}]: {r.detail}"
            assert r.rows_spark > 0, f"{name} k={k}: vacuous slice check"


def test_bounded_slice_media_id_mapping(spark):
    """mm7's slice filter maps media ids back to parent docs (twin =
    -doc_id - 1) — a partial slice must keep exactly the pairs whose
    parents are in-slice, and every in-slice doc contributes at least
    its orig-twin pair (<= 3 flipped dHash bits by construction), so
    the check is non-vacuous at smoke scale."""
    from .conftest import SF_SMOKE

    mod = _load_bounded_sf1()
    r, label, _secs = mod.run_check(
        spark, SF_SMOKE, "mm7_phash_neardup", k_override=48
    )
    assert r.ok, f"mm7 [{label}]: {r.detail}"
    assert r.rows_spark > 0
