"""Training-data pipeline query registry (filled in incrementally:
dedup, similarity search, text analysis, sampling, windowed aggregation,
relational joins)."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
