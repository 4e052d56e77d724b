"""Regenerate catalog/__init__.py's _DRIVER_CERTIFIED set from every
CORRECTNESS_r*.json in the repo root.

Run at the START of each round, after the driver writes the new
artifact: the correctness gate samples only the first 50 catalog
entries, and all_specs() fronts queries not yet in _DRIVER_CERTIFIED —
so this keeps the certification window rotating onto the
never-sampled tail.

Usage: python tools/update_certified.py   (rewrites the set in place)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CATALOG = os.path.join(ROOT, "omfietser_etl_spark", "catalog", "__init__.py")


def green(row: dict, rows_only: bool) -> bool:
    """A row certifies only when rows+schema matched, no error, AND the
    value hash matched. hash_match=None is acceptable only for queries
    that are rows-only BY DESIGN (spec.oracle is None) — otherwise a
    value-mismatched or unhashed row must leave the query eligible to
    rotate back to the front of the gate window."""
    if not (row.get("rows_match") and row.get("schema_match") and not row.get("err")):
        return False
    hm = row.get("hash_match")
    if hm is True:
        return True
    return hm is None and rows_only


def main() -> int:
    sys.path.insert(0, ROOT)
    from omfietser_etl_spark.catalog import all_specs

    rows_only_specs = {s.name for s in all_specs() if s.oracle is None}

    latest_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        with open(path) as f:
            for name, row in json.load(f).items():
                if green(row, name in rows_only_specs):
                    latest_green[name] = max(latest_green.get(name, 0), rnd)
    if not latest_green:
        print("no CORRECTNESS_r*.json artifacts found", file=sys.stderr)
        return 1

    src = open(CATALOG).read()
    body = "\n".join(
        f'    "{n}",' for n in sorted(latest_green)
    )
    new_block = "_DRIVER_CERTIFIED: frozenset[str] = frozenset({\n" + body + "\n})"
    out, count = re.subn(
        r"_DRIVER_CERTIFIED: frozenset\[str\] = frozenset\(\{.*?\}\)",
        new_block,
        src,
        flags=re.S,
    )
    if count != 1:
        print("could not locate the _DRIVER_CERTIFIED block", file=sys.stderr)
        return 1
    round_body = "\n".join(
        f'    "{n}": {r},' for n, r in sorted(latest_green.items())
    )
    round_block = "_CERTIFIED_ROUND: dict[str, int] = {\n" + round_body + "\n}"
    out, count = re.subn(
        r"_CERTIFIED_ROUND: dict\[str, int\] = \{[^}]*\}",
        round_block,
        out,
        flags=re.S,
    )
    if count != 1:
        print("could not locate the _CERTIFIED_ROUND block", file=sys.stderr)
        return 1
    with open(CATALOG, "w") as f:
        f.write(out)

    import importlib

    import omfietser_etl_spark.catalog as _cat

    importlib.reload(_cat)
    all_specs, _DRIVER_CERTIFIED = _cat.all_specs, _cat._DRIVER_CERTIFIED

    specs = all_specs()
    fresh = [s.name for s in specs if s.name not in _DRIVER_CERTIFIED]
    print(f"certified: {len(_DRIVER_CERTIFIED)}; catalog: {len(specs)}; "
          f"fresh fronted: {len(fresh)}; next sample covers "
          f"{min(50, len(fresh))} of them")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
