"""Benchmark runner: times every declared catalog query at one scale factor.

Each query runs SPARK_GRAFT_REPS times (default 3) and reports the
per-query MEDIAN — single-run numbers showed >=2x noise on a loaded
host (d2 went 4.2s -> 9.0s between runs with no code change), which
made regressions indistinguishable from load spikes.

Env:
    SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] core count (default 32)
    SPARK_GRAFT_REPS    runs per query, median reported (default 3)

Host-noise calibration: BENCH_HISTORY proved whole-run 2x wobble on
this host (the same 115-query catalog ran 66.8s and 136.0s hours
apart, zero code changes), so a battery of FIVE frozen sentinel
shapes (see SENTINEL_REFS) runs at the start AND end of every bench.
host_factor = median of the per-shape end/ref ratios; host_spread =
max/min ratio flags unevenly-loaded windows. The JSON carries the raw
total and value_normalized = total / host_factor; cross-round
comparisons should use the normalized number only when host_spread is
small (≲1.3), else prefer best-window raw totals.

Prints ONE compact JSON line (the driver captures only the last ~2KB
of stdout, so the official artifact must fit):
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "sf": ..., "reps": N, "sentinel": {...}, "host_factor": F,
     "value_normalized": sec, "families": {...}, "n_queries": N,
     "slowest": {20 slowest queries}, "detail": "BENCH_HISTORY.jsonl"}
Full per-query timings are appended to BENCH_HISTORY.jsonl, and the
SELECTED window's full record (including the complete `queries` map)
is written to BENCH_LAST.json (round 13 — so PERF comparisons get
per-query data even though stdout stays compact).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Host-noise calibration, round-7 instrument. The round-6 2-sentinel
#: design (two sub-second CATALOG queries) disagreed with a
#: clean-window rerun by 27% (driver host_factor 1.47 vs builder
#: 1.034, see SCALING.md) — sub-second shapes are dominated by fixed
#: per-query overhead, and refs pinned to catalog queries silently go
#: stale when the query itself is optimized. The sentinels are now
#: FIVE frozen shapes defined HERE (never touched by catalog work),
#: each ≥ ~1.5-4.5 s at sf0.1/local[32], spanning the contention axes
#: shared-host load hits non-uniformly: parquet scan+decode (io),
#: wide-key exchange+agg (shuffle), whole-stage-codegen arithmetic
#: (cpu), partitioned sort+window (sort), and the Arrow/Python worker
#: path (arrow). host_factor = MEDIAN of the per-sentinel end/ref
#: ratios (robust to one polluted axis); host_spread = max/min ratio
#: is reported alongside — read cross-round deltas only when spread
#: is small (≲1.3), otherwise the window was unevenly loaded.
#: END-battery only, as before: every run reaches it through the
#: identical full-catalog workload; the fresh-session START battery
#: (JIT warm-up) is recorded for diagnostics.
#: Refs: round-12 close pin at the 185-query catalog — the per-axis
#: MEDIAN of the END batteries of the round's FOUR clean idle
#: full-catalog windows (BENCH_HISTORY ts 1786974732, 1787004119,
#: 1787010537, 1787011550; a fifth window at ts 1787009510 degraded
#: mid-run — every axis 1.2-2.4x, VM steal visible — and is
#: excluded). Replaces the interim single-window pin from the same
#: round (which under-read host_factor whenever the host was merely
#: ordinary, because the baseline window's battery was unusually
#: fast).
#: Pre-touch protocol as round 10 (_pretouch_sentinel_inputs before
#: every battery): the four pinned windows' END io_scan spanned
#: 1.38–2.70 s — never compare a battery measured WITHOUT the
#: pre-touch against these refs. END-position still matters for arrow (~1.9 s
#: fresh vs ~4.7–5.8 s after the full catalog — Python-worker daemon
#: state), so refs stay anchored at the measurement battery's
#: position. HOST-ERA CAVEAT (round-11 lesson): refs absorb slow
#: drift via host_factor only imperfectly — a cross-round total
#: that moves >10% with untouched code should be adjudicated with
#: the /tmp old-tree probe (SCALING.md round 11), not argued from
#: sentinel ratios alone.
SENTINEL_REFS = {
    "io_scan": 1.434,
    "shuffle_agg": 2.268,
    "cpu_codegen": 2.142,
    "sort_window": 4.458,
    "arrow_python": 5.167,
}
SENTINEL_REPS = 5
#: CATALOG COMPOSITION IS PART OF THE REF-INVALIDATION CONTRACT
#: (round-7 ADVICE): the END-battery position encodes session state
#: accumulated over the CURRENT catalog — arrow_python measures 1.6 s
#: fresh vs 4.6 s after the 175-query battery, so adding/removing
#: queries silently shifts that axis and biases host_factor. The refs
#: above were pinned against the catalog fingerprinted below; when the
#: catalog changes, re-measure the END battery on a clean window and
#: re-pin SENTINEL_REFS + SENTINEL_REF_CATALOG together
#: (tests/test_tools.py::test_bench_refs_pinned_to_current_catalog
#: enforces the pairing). Until re-pinned, bench.py self-reports
#: refs_stale=true and comparable=false in the artifact.
SENTINEL_REF_CATALOG = "ed987735c8a0c818"  # 185 queries, pinned 2026-08-17 (r12)
#: host_spread above this means the window was unevenly loaded and
#: cross-round normalized deltas must not be read (the r06 1.47-spread
#: window is the motivating example). DELIBERATELY CONSERVATIVE: the
#: arrow axis is BIMODAL across clean windows (round-8 probe: a fresh
#: reuse=true session settles at ~1.5 s, but the aged END value lands
#: at ~4.5 s or ~8 s depending on daemon state — 4.44/4.62/7.54/8.0
#: measured on idle windows, same catalog), so clean windows often
#: flag as incomparable. That false-positive direction is safe (a bad
#: delta is never read as real); the robust cross-round practice is
#: best-of-raw over ≥3 windows. Excluding arrow from the spread was
#: measured and REJECTED: the round-8 close-1 window (sentinels fast
#: 0.77–0.94, catalog slow — load arrived mid-window) would have
#: passed a 4-axis gate at 1.23 and mislabeled a misleading
#: normalized total as comparable. If a future round needs a flat
#: arrow axis: spark.python.worker.reuse=false measures 2.3 s ±0.1
#: regardless of session age (fork-per-task, ~0.8 s slower than warm
#: reuse on the 16M-row shape) — a session-conf change that
#: invalidates ALL refs; re-pin under it.
COMPARABLE_SPREAD_MAX = 1.3


def catalog_fingerprint(names) -> str:
    """Stable 16-hex digest of the sorted query-name set."""
    import hashlib

    return hashlib.sha256("\n".join(sorted(names)).encode()).hexdigest()[:16]


def comparable(host_spread: float, refs_stale: bool) -> bool:
    """True when this run's normalized number may be compared across
    rounds: sentinel refs match the catalog they were pinned on AND
    the window's load was even (spread within COMPARABLE_SPREAD_MAX)."""
    return (not refs_stale) and host_spread <= COMPARABLE_SPREAD_MAX


#: One bounded in-process retry when the WINDOW (not the code) is the
#: problem: round 11's official artifact landed on a host_factor-1.247
#: era (x3 read 14.4 s vs 1.4 s on clean windows, untouched code) and
#: poisoned the round's per-query record. Retry only on a high
#: host_factor — a stale-refs flag is a code-state fact a re-run can't
#: fix, and a spread-only flag (single-axis arrow/io draw on an
#: otherwise-idle window) is the documented false-positive direction.
RETRY_HOST_FACTOR = 1.2
#: Don't retry when the first window already burned a big budget (the
#: driver's round window is finite); 900 s covers sf0.1 with margin.
RETRY_BUDGET_SEC = 900.0


def should_retry(host_factor: float, attempt: int, total_sec: float) -> bool:
    """Bounded retry decision: one extra window, only when the first
    self-flagged via host_factor (the era-pollution signature) and the
    time budget allows. Pure so tests pin every branch."""
    return (
        attempt == 0
        and host_factor > RETRY_HOST_FACTOR
        and total_sec <= RETRY_BUDGET_SEC
    )


def _sentinel_shapes():
    """name -> build(spark, sf_dir) -> DataFrame. Frozen: changing any
    shape (or data size) invalidates SENTINEL_REFS — re-measure and
    re-pin together, never independently."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def io_scan(spark, sf_dir):
        # parquet scan+decode throughput: 40x full-width reads of the
        # largest table, one cheap hash-fold so nothing is pruned.
        df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        out = df
        for _ in range(39):
            out = out.unionByName(df)
        h = F.pmod(F.xxhash64(*df.columns), F.lit(1000000007)).cast("long")
        return out.select(F.sum(h).alias("h"))

    def shuffle_agg(spark, sf_dir):
        # wide string-key exchange + two-level hash agg.
        base = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        df = base.unionByName(base).unionByName(base).unionByName(base)
        return (
            df.withColumn(
                "k", F.concat_ws("-", "l_orderkey", "l_partkey", "l_linenumber")
            )
            .repartition(128, "k")
            .groupBy("k")
            .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy(F.crc32(F.col("k")) % 9973)
            .agg(F.sum("s").alias("t"), F.sum("n").alias("m"))
        )

    def cpu_codegen(spark, sf_dir):
        # pure whole-stage-codegen arithmetic, data-independent.
        x = F.col("id")
        acc = F.lit(0).cast("long")
        for i in range(4):
            acc = acc + F.pmod(F.xxhash64(x + F.lit(i)), F.lit(1000000007))
        return spark.range(1_500_000_000).select(F.sum(acc).alias("h"))

    def sort_window(spark, sf_dir):
        # partitioned sort + frame-walking window, synthetic keys.
        df = spark.range(20_000_000).select(
            (F.col("id") % 64).alias("b"),
            ((F.col("id") * 2654435761) % 1000000007).alias("k"),
        )
        w = Window.partitionBy("b").orderBy("k")
        return df.select(
            (F.col("k") - F.lag("k", 1, 0).over(w)).alias("d")
        ).agg(F.sum("d").alias("s"))

    def arrow_python(spark, sf_dir):
        # Arrow batch transfer + Python worker round-trip (closure
        # pickled by value — no repo imports in the worker).
        df = spark.range(16_000_000).select(
            F.col("id"), (F.col("id") % 997).alias("v")
        )

        def fold(it):
            import pandas as pd

            for pdf in it:
                yield pd.DataFrame(
                    {"s": [int((pdf.id * pdf.v).sum())], "n": [len(pdf)]}
                )

        return (
            df.repartition(32)
            .mapInPandas(fold, "s long, n long")
            .agg(F.sum("s").alias("t"), F.sum("n").alias("n"))
        )

    return {
        "io_scan": io_scan,
        "shuffle_agg": shuffle_agg,
        "cpu_codegen": cpu_codegen,
        "sort_window": sort_window,
        "arrow_python": arrow_python,
    }


def _time_query(build, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _sentinel_median(build, spark, sf_dir) -> float:
    return round(
        statistics.median(_time_query(build, spark, sf_dir) for _ in range(SENTINEL_REPS)),
        3,
    )


def _pretouch_sentinel_inputs(spark, sf_dir) -> None:
    """Deterministic page-cache state before EACH sentinel battery
    (round-10, verdict #4): the io_scan/shuffle_agg shapes read
    lineitem, and the catalog run between the START and END batteries
    evicts an unpredictable fraction of its pages — the io axis
    wobbled 1.5–3.9 s across IDLE same-catalog windows in round 9,
    flagging otherwise-clean windows. One full-width noop scan
    immediately before the battery puts the file in the same cache
    state every time (the same fix that killed st12's 17.7-vs-3.4 s
    cold-read artifact on the catalog side). Refs were re-pinned
    under this protocol — never measure a battery without it."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").write.format(
        "noop"
    ).mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("omfietser-etl-spark-bench")
        # The builder launches the JVM, so driver memory set here takes
        # effect. The default 1g heap OOMs once the catalog's memoized/
        # persisted frames accumulate across the full catalog at sf0.1.
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.codegen.maxFields", "25")  # see session.load() note
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # plan, not session startup — including one full-width noop scan of
    # EVERY table so the parquet footprint (OS page cache, decoder JIT,
    # file-index metadata) is warm before the first timed query.
    # Without this, whichever queries run first (the fresh-first
    # ordering puts NEW queries there) absorb the whole cold-IO cost
    # into their recorded medians: round-9 measurement — st12 benched
    # 17.7 s in a window where its steady-state cost is 3.4 s, purely
    # because it was the first fresh query over cold sf0.1 parquet.
    from omfietser_etl_spark.session import TABLES

    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()
    next(iter(qs.values()))(spark, sf_dir).write.format("noop").mode("overwrite").save()

    shapes = _sentinel_shapes()
    for build in shapes.values():  # one warm lap (JIT/codegen)
        _time_query(build, spark, sf_dir)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))

    def _measure_window() -> dict:
        """One full measured window: START sentinels, catalog at
        `reps` medians, END sentinels, calibration + rollups."""
        _pretouch_sentinel_inputs(spark, sf_dir)
        sentinel_start = {
            name: _sentinel_median(build, spark, sf_dir)
            for name, build in shapes.items()
        }

        timings: dict[str, float] = {}
        for name, build in qs.items():
            runs = [_time_query(build, spark, sf_dir) for _ in range(reps)]
            timings[name] = round(statistics.median(runs), 3)

        _pretouch_sentinel_inputs(spark, sf_dir)
        sentinel_end = {
            name: _sentinel_median(build, spark, sf_dir)
            for name, build in shapes.items()
        }
        ratios = {
            n: round(sentinel_end[n] / ref, 3) for n, ref in SENTINEL_REFS.items()
        }
        host_factor = round(max(0.25, statistics.median(ratios.values())), 3)
        host_spread = round(
            max(ratios.values()) / max(min(ratios.values()), 1e-9), 3
        )
        refs_stale = catalog_fingerprint(qs) != SENTINEL_REF_CATALOG

        # family rollups (prefix-keyed) so cross-round artifact diffs
        # read at a glance; "other" catches anything unprefixed.
        fams = ("p", "d", "td", "ta", "ts", "tv", "tc", "tp", "mm", "st",
                "ev", "h", "a", "j", "o", "u", "s", "x", "q", "dd", "ca", "f")
        families: dict[str, float] = {}
        for name, sec in timings.items():
            pref = next(
                (f for f in sorted(fams, key=len, reverse=True)
                 if name.startswith(f) and name[len(f):][:1].isdigit()),
                "other",
            )
            families[pref] = round(families.get(pref, 0.0) + sec, 3)

        total = round(sum(timings.values()), 3)
        return {
            "metric": "catalog_total_wall",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "reps": reps,
            "sentinel": {
                "refs": SENTINEL_REFS,
                "start": sentinel_start,
                "end": sentinel_end,
                "ratios": ratios,
            },
            "host_factor": host_factor,
            "host_spread": host_spread,
            "refs_stale": refs_stale,
            "comparable": comparable(host_spread, refs_stale),
            "value_normalized": round(total / host_factor, 3),
            "families": dict(sorted(families.items(), key=lambda kv: -kv[1])),
        }

    def _append_history(line: dict) -> None:
        # Round-over-round history (BENCH_HISTORY.jsonl is committed)
        # keeps the FULL per-query detail so regressions stay diffable.
        try:
            hist = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.jsonl"
            )
            with open(hist, "a") as f:
                f.write(json.dumps({"ts": int(time.time()), **line}) + "\n")
        except OSError:
            pass

    windows = [_measure_window()]
    _append_history(windows[0])
    retry_on = os.environ.get("SPARK_GRAFT_BENCH_RETRY", "1") != "0"
    if retry_on and should_retry(
        windows[0]["host_factor"], 0, windows[0]["value"]
    ):
        windows.append(_measure_window())
        _append_history(windows[-1])
    # Report the cleaner window (lower host_factor = closer to the
    # pinned era); both windows land in history either way.
    line = min(windows, key=lambda w: w["host_factor"])
    line["windows_run"] = len(windows)
    # Round-13 (verdict item 8): persist the SELECTED window's FULL
    # per-query map to a committed artifact so the driver's PERF
    # comparison can compute per-query speedups and scaling ratios —
    # the compact stdout line only carries the 20 slowest (the
    # driver records ~2000 chars of stdout), which left PERF_r12's
    # per_query/geomean empty.
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST.json"
            ),
            "w",
        ) as f:
            json.dump(line, f, indent=1, sort_keys=True)
    except OSError:
        pass
    if not line["comparable"]:
        line["note"] = "comparable=false — read value_normalized, not value"
    # The driver records only the LAST ~2000 chars of stdout, so the
    # official BENCH_rN.json must be compact to parse (r03/r04 were
    # truncated mid-JSON). Print a summary line: totals, calibration,
    # family rollups, and the 20 slowest queries; full detail lives in
    # BENCH_HISTORY.jsonl.
    slowest = dict(sorted(line["queries"].items(), key=lambda kv: -kv[1])[:20])
    compact = {k: v for k, v in line.items() if k != "queries"}
    compact["n_queries"] = len(line["queries"])
    compact["slowest"] = slowest
    compact["detail"] = "BENCH_HISTORY.jsonl"
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
