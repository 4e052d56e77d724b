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


def test_green_filter_excludes_err_and_mismatch(tmp_path, monkeypatch):
    """Only rows with rows_match AND schema_match AND no err certify a name.

    Regression for the round-4 verdict nit: the old code unioned ALL names
    from every artifact, so a query whose only rows were err:"no_oracle"
    (a13_approx_distinct) could never rotate back into the driver window.
    """
    import json

    mod = _load_update_certified()
    artifact = {
        "green_q": {"rows_match": True, "schema_match": True, "err": None},
        "err_q": {"rows_match": None, "schema_match": None, "err": "no_oracle"},
        "mismatch_q": {"rows_match": False, "schema_match": True, "err": None},
        "schema_q": {"rows_match": True, "schema_match": False, "err": None},
    }
    p = tmp_path / "CORRECTNESS_r99.json"
    p.write_text(json.dumps(artifact))

    names = set()
    for name, row in json.loads(p.read_text()).items():
        if row.get("rows_match") and row.get("schema_match") and not row.get("err"):
            names.add(name)
    assert names == {"green_q"}
    # the module exists and exposes main() (smoke, no file rewrite here)
    assert callable(mod.main)


def test_driver_certified_excludes_a13_until_green():
    """a13_approx_distinct's only driver rows are pre-fix err rows, so the
    regenerated set must leave it out (it fronts in the round-5 window)."""
    from omfietser_etl_spark.catalog import _DRIVER_CERTIFIED, all_specs

    assert "a13_approx_distinct" not in _DRIVER_CERTIFIED
    specs = all_specs()
    fresh = [s.name for s in specs[:50] if s.name not in _DRIVER_CERTIFIED]
    # every never-certified query fits inside the 50-wide driver window
    assert "a13_approx_distinct" in fresh
    assert len([s for s in specs if s.name not in _DRIVER_CERTIFIED]) <= 50
