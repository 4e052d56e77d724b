"""SparkSession factory with scale-oriented defaults.

Defaults target a real cluster (AQE on, skew handling, sane broadcast
threshold) while remaining correct on local[N]. Tests/bench override
parallelism knobs via arguments or env.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "omfietser-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    - AQE enabled (coalesce partitions, skew-join handling) so plans
      re-optimize at runtime — the 100 TB posture's first line of defense.
    - UTC session timezone for deterministic date/time semantics.
    - Arrow enabled for the (rare) pandas-UDF paths.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.codegen.maxFields", "25")  # see load() note
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, table: str, fanout: bool = False):
    """Read one driver-provided parquet table as a DataFrame.

    The events table stores TIMESTAMP(NANOS) which Spark 4 rejects by
    default; we read it as epoch-nanos LongType (engine-neutral — the
    DuckDB oracle uses epoch_ns for the same integer semantics).

    ``fanout=True`` round-robins the scan across the full core count
    before a CPU-bound map stage (regex cascades, JSON synthesis+parse).
    Small parquet inputs arrive as 1-3 splits, which would otherwise
    serialize the expensive map on as many cores; the repartition is a
    narrow-row shuffle, orders of magnitude cheaper than the map it
    parallelizes. On a real cluster with many input splits it is a
    cheap no-op-shaped rebalance, never a correctness change.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    # The gate/driver runs a VANILLA SparkSession (host-local timezone),
    # and the events NTZ->TIMESTAMP cast below interprets wall clock in
    # the session tz. Pin UTC here (runtime-settable) so epoch-nanos
    # extraction matches the DuckDB oracle's epoch_ns on any host.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The 32-column unified pipeline stages generate one >64 KB
    # whole-stage method that janino cannot compile; Spark then pays a
    # multi-second doomed compile attempt per execution before falling
    # back. Capping codegen at 25 fields skips the attempt for exactly
    # those wide stages (per-expression codegen still applies) and
    # leaves every narrow analytic plan in whole-stage codegen.
    # Runtime-settable, so it reaches vanilla driver sessions via this
    # load() path.
    spark.conf.set("spark.sql.codegen.maxFields", "25")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        # Normalize ts to epoch-nanos LongType regardless of the
        # parquet physical type. Testdata generations have shipped ts
        # both as TIMESTAMP(NANOS) (read as long via nanosAsLong) and
        # as timestamp[us] (read as TIMESTAMP_NTZ); downstream query
        # code and every DuckDB oracle (epoch_ns(ts)) assume exact
        # integer-nanos semantics, which this restores for either
        # source. Session tz is UTC, so the NTZ→TS cast is identity.
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type.startswith("timestamp"):
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts",
                (F.unix_micros(F.col("ts").cast("timestamp")) * 1000).cast("long"),
            )
    if fanout:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df
