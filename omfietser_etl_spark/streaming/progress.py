"""ST5-adjacent: per-batch progress events via StreamingQueryListener.

The reference's job manager emits progress/ETA events after every
micro-batch (api/services/job-manager.ts:278-348: processed counts,
success/failed tallies, rate, ETA). Spark already measures all of
that per micro-batch; this listener adapts
``StreamingQueryProgress`` into the same event shape and hands each
event to a caller-supplied sink (default: an in-memory list — swap
in a webhook/file writer; the reference POSTs to n8n).

Driver-side by design: progress events are per-query metadata, a few
rows per trigger — never data-plane volume.
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql.streaming import StreamingQueryListener


class JobProgressListener(StreamingQueryListener):
    """Collects per-batch progress events (reference parity fields)."""

    def __init__(self, emit: Callable[[dict[str, Any]], None] | None = None) -> None:
        self.events: list[dict[str, Any]] = []
        self._emit = emit
        self._totals: dict[str, int] = {}

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self._push({"event": "job_started", "query_id": str(event.id),
                    "run_id": str(event.runId), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        raw = json.loads(p.json)
        qid = str(p.id)
        total = self._totals.get(qid, 0) + int(p.numInputRows)
        self._totals[qid] = total
        self._push(
            {
                "event": "job_progress",
                "query_id": qid,
                "batch_id": int(p.batchId),
                "batch_rows": int(p.numInputRows),
                "total_rows": total,
                "rows_per_sec": raw.get("processedRowsPerSecond", 0.0),
                "batch_duration_ms": raw.get("durationMs", {}).get("triggerExecution"),
                "timestamp": p.timestamp,
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover — timing-dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self._push(
            {
                "event": "job_finished",
                "query_id": str(event.id),
                "error": str(event.exception) if event.exception else None,
            }
        )

    # -- helpers ------------------------------------------------------------
    def _push(self, ev: dict[str, Any]) -> None:
        self.events.append(ev)
        if self._emit is not None:
            self._emit(ev)

    def progress_events(self, query_id: str | None = None) -> list[dict[str, Any]]:
        evs = [e for e in self.events if e["event"] == "job_progress"]
        if query_id is not None:
            evs = [e for e in evs if e["query_id"] == query_id]
        return evs
