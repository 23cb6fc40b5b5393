"""Per-drain micro-batch progress capture (observability).

Every bounded ``stream_*_live`` drain records its query's
``recentProgress`` here just before stopping, keyed by drain family
(the part of the query name before the fixture hash).  This is how the
per-drain machinery cost is ITEMIZED rather than asserted: progress
rows carry ``durationMs`` (triggerExecution / addBatch / walCommit /
commitOffsets / queryPlanning / getBatch / latestOffset) and
``stateOperators`` commit metrics, so a probe — or an operator reading
logs on a real cluster — can decompose drain wall into

  actual data work        (addBatch)
  commit-log fsyncs       (walCommit + commitOffsets)
  state-store commits     (stateOperators[].commitTimeMs)
  trigger bookkeeping     (triggerExecution minus the above)
  start/stop machinery    (wall minus sum of triggerExecution)

Capture is a bounded driver-side list copy per drain (micro-batch
count rows, single digits for availableNow fixtures; Spark itself
already retains these in memory) — zero cost on the executor path.
"""

from __future__ import annotations

import json
from typing import Any

#: drain family -> list of progress dicts from the LAST completed drain
LAST_PROGRESS: dict[str, list[dict[str, Any]]] = {}


def record_progress(q, family: str | None = None) -> None:
    """Store ``q.recentProgress`` under ``family`` (or the query's
    name with its fixture-hash suffix stripped — foreachBatch drains
    have no queryName, so they pass family explicitly).

    Never raises: observability must not fail a drain (a progress
    payload Spark changes shape on is dropped, not fatal)."""
    try:
        name = family or (q.name or str(q.id)).rsplit("_", 1)[0]
        rows = []
        for p in q.recentProgress:
            rows.append(p if isinstance(p, dict) else json.loads(str(p)))
        LAST_PROGRESS[name] = rows
    except Exception:  # pragma: no cover - defensive by contract
        pass
