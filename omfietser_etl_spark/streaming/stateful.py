"""Custom stateful streaming operator: per-key latest-state tracking
with change suppression, on ``applyInPandasWithState``.

This is the streaming-native form of the reference's upsert loop
(ST3 latest-wins + ST4 content-hash skip): the per-key state —
(latest order value, latest content hash) — lives in Spark's state
store instead of a rewritten parquet table, so each micro-batch
touches only the keys it contains. Emitted rows are exactly the
batch rows that changed the state (new key, newer row with a
different hash), i.e. the rows the reference would upsert+log
(ref: api/services/job-manager.ts:148-416 job loop;
transform-products-for-db.js:29-41 hash skip).

Scale: state is hash-partitioned by key across executors (the same
shuffle a groupBy costs), RocksDB-backed on a real cluster
(``spark.sql.streaming.stateStore.providerClass``); no full-state
rewrites ever. Compare `incremental.upsert_stream`, whose
foreachBatch-MERGE shape is the right fit when downstream needs the
full current state as a TABLE; this operator is the fit when
downstream needs the CHANGE STREAM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def changed_rows_stream(
    stream: DataFrame,
    keys: list[str],
    order_col: str,
    hash_col: str = "content_hash",
    emit_cols: list[str] | None = None,
) -> DataFrame:
    """Emit only state-changing rows per key (latest-wins semantics).

    ``stream`` must already carry ``hash_col`` (see
    ``incremental.with_content_hash``) and an ordering column
    (monotone per key, e.g. scraped_at). Rows are emitted when the
    key is new OR the incoming row is not older than the stored one
    and its hash differs. Late rows (older than state) are dropped.
    """
    emit_cols = emit_cols or list(stream.columns)
    for required in (order_col, hash_col):
        if required not in emit_cols:
            emit_cols.append(required)
    out_schema = StructType([stream.schema[c] for c in emit_cols])
    state_schema = StructType(
        [stream.schema[order_col], stream.schema[hash_col]]
    )
    order_ix = emit_cols.index(order_col)
    hash_ix = emit_cols.index(hash_col)

    def track(key, pdfs, state):
        import pandas as pd

        if state.exists:
            cur_order, cur_hash = state.get
        else:
            cur_order, cur_hash = None, None
        # Materialize ALL Arrow chunks before sorting: a group's batch
        # rows arrive as multiple chunks in ARBITRARY order, so a
        # per-chunk sort would process same-batch updates out of order
        # nondeterministically (review round-6 finding).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return iter(())
        rows = pd.concat(chunks, ignore_index=True).sort_values(
            order_col, kind="stable"
        )
        out = []
        for row in rows.itertuples(index=False):
            o, h = row[order_ix], row[hash_ix]
            if cur_order is not None and o < cur_order:
                continue  # late arrival — state already newer
            if h == cur_hash:
                # unchanged payload — skip the emit (ST4), but STILL
                # advance the stored order: otherwise a later
                # out-of-order row with older order and different
                # hash would pass the lateness check and overwrite
                # newer state (review round-6 finding).
                if cur_order is None or o > cur_order:
                    cur_order = o
                continue
            cur_order, cur_hash = o, h
            out.append(row)
        if cur_order is not None:
            state.update((cur_order, cur_hash))
        if not out:
            return iter(())
        return iter([pd.DataFrame(out, columns=emit_cols)])

    grouped = stream.select(*emit_cols).groupBy(*keys)
    return grouped.applyInPandasWithState(
        track, out_schema, state_schema, "append", "NoTimeout"
    )
