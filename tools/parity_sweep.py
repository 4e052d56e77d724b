"""Run every catalog spec against its DuckDB oracle at an arbitrary SF
(default sf0.01 — the driver's correctness-gate scale) under the
ENGINE session (get_spark: AQE, tuned confs) — the complementary
surface to tools/driver_sim.py's vanilla session."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from omfietser_etl_spark.catalog import all_specs
from omfietser_etl_spark.parity import compare, duck_connect
from omfietser_etl_spark.session import get_spark

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

spark = get_spark()
duck = duck_connect(sf)
fails = []
for spec in all_specs():
    if only and spec.name not in only:
        continue
    t0 = time.time()
    if spec.oracle is None:
        n = spec.build(spark, sf).count()
        print(f"{spec.name}: rows_only rows={n} ({time.time()-t0:.1f}s)")
        continue
    res = compare(spec.name, spec.build(spark, sf), spec.oracle, duck)
    status = "OK" if res.ok else f"FAIL {res.detail}"
    print(f"{spec.name}: {status} (spark={res.rows_spark} oracle={res.rows_oracle}, {time.time()-t0:.1f}s)")
    if not res.ok:
        fails.append(spec.name)
print(f"\n{len(fails)} failures: {fails}")
sys.exit(1 if fails else 0)
