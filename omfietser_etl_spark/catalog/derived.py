"""Derived-column operator queries (SURVEY §2.5–§2.7) — filled in M2."""

from __future__ import annotations

SPECS: list = []
