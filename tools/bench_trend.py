"""Cross-round bench trend reader: best-of-raw per catalog epoch and a
per-query diff between the two most recent epochs' best windows.

Single-window totals on this host wobble ~2× and the comparable gate
correctly rejects most windows (see bench.py SENTINEL docs) — so the
robust cross-round read is BEST RAW WINDOW per catalog composition,
diffed per query. This tool automates exactly that read so nobody
hand-joins BENCH_HISTORY.jsonl rows again.

Usage:
    python tools/bench_trend.py [history_path] [top_n]

Epochs are runs of consecutive history rows sharing a catalog
composition (the sorted query-name set — compositions can repeat
totals like 175→176 never do, names are the identity). Within each
epoch the BEST (lowest raw total) window represents it; the last two
epochs' best windows are joined per query and the top movers printed.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_epochs(path: str) -> list[dict]:
    """History rows grouped into epochs of identical catalog
    composition, each epoch represented by its best (lowest raw
    total) full-detail window. Epochs are consecutive: a composition
    seen again later (rollback) starts a NEW epoch rather than
    polluting the old one. Rows without per-query detail are skipped;
    a detail-bearing row missing its total derives it from the
    per-query sums instead of aborting the whole read (round-8
    ADVICE). Normalized totals are tracked ONLY from windows whose
    `comparable` flag is true — the raw best may come from a flagged
    window (raw totals are load-inclusive either way), but a
    normalized number from an unevenly-loaded window is exactly the
    misread the flag exists to prevent."""
    epochs: list[dict] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            queries = row.get("queries")
            if not queries:
                continue
            if row.get("value") is None:
                row["value"] = round(sum(queries.values()), 3)
            comp = bool(row.get("comparable"))
            norm = row.get("value_normalized") if comp else None
            key = tuple(sorted(queries))
            if not epochs or epochs[-1]["key"] != key:
                epochs.append({"key": key, "best": row, "windows": 1,
                               "clean_windows": int(comp),
                               "best_norm": norm})
            else:
                e = epochs[-1]
                e["windows"] += 1
                if row["value"] < e["best"]["value"]:
                    e["best"] = row
                if comp:
                    e["clean_windows"] += 1
                    if norm is not None and (
                        e["best_norm"] is None or norm < e["best_norm"]
                    ):
                        e["best_norm"] = norm
    return epochs


def diff_best(prev: dict, cur: dict, top_n: int) -> list[str]:
    """Markdown lines: shared-query total delta + top movers by
    absolute per-query delta between two best windows."""
    pq, cq = prev["queries"], cur["queries"]
    shared = sorted(set(pq) & set(cq))
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))
    p_tot = round(sum(pq[n] for n in shared), 1)
    c_tot = round(sum(cq[n] for n in shared), 1)
    lines = [
        f"shared {len(shared)} queries: {p_tot} s -> {c_tot} s "
        f"({c_tot / max(p_tot, 1e-9):.2f}x)"
        + (f"; added: {', '.join(added)}" if added else "")
        + (f"; removed: {', '.join(removed)}" if removed else ""),
        "",
        "| query | prev (s) | cur (s) | delta |",
        "|---|---|---|---|",
    ]
    movers = sorted(shared, key=lambda n: -abs(cq[n] - pq[n]))[:top_n]
    for n in movers:
        lines.append(
            f"| {n} | {pq[n]:.2f} | {cq[n]:.2f} | {cq[n] - pq[n]:+.2f} |"
        )
    return lines


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "BENCH_HISTORY.jsonl"
    )
    try:
        top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    except ValueError:
        print("usage: python tools/bench_trend.py [history_path] [top_n]",
              file=sys.stderr)
        return 2
    if not os.path.isfile(path):
        print(f"no history at {path}", file=sys.stderr)
        return 2
    epochs = load_epochs(path)
    if not epochs:
        print("no full-detail bench rows found", file=sys.stderr)
        return 1

    print("| epoch | queries | windows | clean | best raw (s) "
          "| best normalized (clean only) |")
    print("|---|---|---|---|---|---|")
    for i, e in enumerate(epochs, 1):
        norm = e["best_norm"] if e["best_norm"] is not None else "—"
        print(f"| {i} | {len(e['key'])} | {e['windows']} "
              f"| {e['clean_windows']} | {e['best']['value']} | {norm} |")
    if len(epochs) >= 2:
        print(f"\n## best-window diff: epoch {len(epochs) - 1} -> "
              f"{len(epochs)}\n")
        for line in diff_best(epochs[-2]["best"], epochs[-1]["best"], top_n):
            print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
