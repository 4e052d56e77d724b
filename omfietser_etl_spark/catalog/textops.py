"""Text/dedup/similarity operator queries (SURVEY §7.6 ⊕) — filled in M3."""

from __future__ import annotations

SPECS: list = []
