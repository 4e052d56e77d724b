"""Capture `.explain("formatted")` for catalog queries into text files.

Usage:
    python tools/capture_plans.py OUTDIR [sf_dir] [query ...]

Writes OUTDIR/<query>.txt for each query (default: every catalog
query at /root/testdata/sf0.1). Building a composition query executes
its driver-coordinated loops (CC convergence, HITS iterations), so a
full sweep takes a few minutes — it is still far cheaper than a bench
window because nothing downstream of the final plan runs.

The round-12 optimization deliverable (`plans/r12/<q>_before.txt` /
`..._after.txt`) is produced by pointing OUTDIR at a scratch dir and
copying the files under the _before/_after names.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)

    from omfietser_etl_spark.catalog import all_specs
    from omfietser_etl_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
        "formatted"
    )

    wanted = set(sys.argv[3:])
    n_err = 0
    for s in all_specs():
        if wanted and s.name not in wanted:
            continue
        try:
            df = s.build(spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(mode)  # noqa: SLF001
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            txt = f"ERROR building/explaining {s.name}: {exc}"
            n_err += 1
        with open(os.path.join(outdir, f"{s.name}.txt"), "w") as f:
            f.write(txt)
        print(s.name, flush=True)
    spark.stop()
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
