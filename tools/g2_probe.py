"""One-off probe: time g2_triangle_count at sf0.1 under the bench
session config and count FileScan / SortMergeJoin / ReusedExchange
nodes in the executed plan. Not part of the shipped engine."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .appName("g2-probe")
    .config("spark.driver.memory", "8g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.codegen.maxFields", "25")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from omfietser_etl_spark.catalog import opsspec

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

for i in range(reps):
    t0 = time.perf_counter()
    df = opsspec.g2_triangle_count(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    print(f"run {i}: {time.perf_counter() - t0:.2f}s", flush=True)

df = opsspec.g2_triangle_count(spark, sf)
df.collect()  # execute df's OWN QueryExecution so the AQE plan finalizes
# post-action formatted explain shows the FINAL adaptive plan
plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
    df._jdf.queryExecution(), "formatted"
)
print("\nisFinalPlan:", "isFinalPlan=true" in plan)
for tok in ("Scan parquet", "SortMergeJoin", "ReusedExchange", "Exchange",
            "InMemoryTableScan", "BroadcastHashJoin", "AQEShuffleRead"):
    print(tok, plan.count(tok))
spark.stop()

import re
blocks = re.findall(r"^\(\d+\) [^\n]*", plan, re.M)
from collections import Counter
names = Counter(b.split(") ", 1)[1].split(" [")[0].split(" (")[0] for b in blocks)
print("NODECOUNTS", dict(names.most_common()))
open("/tmp/g2_plan.txt", "w").write(plan)
