"""Per-partition build manifest: lineage, metrics, resume.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". The manifest is a driver-side JSON file (atomic rename on every
update) recording one entry per committed build unit:

    {unit, status, rows_in, rows_out, bytes_out, wall_ms, finished_at}

A re-run with --resume skips units already 'done' (their output directory
is intact) — the reference's only resume mechanism is the crawler's Redis
visited-set (Crawler/crawler.py:145-150); index builds restart from zero
(SURVEY §4 "Checkpoint / resume").
"""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, path: str):
        self.path = path
        self.entries: dict[str, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                self.entries = json.load(f)

    def is_done(self, unit: str) -> bool:
        return self.entries.get(unit, {}).get("status") == "done"

    def mark(self, unit: str, status: str = "done", **metrics) -> None:
        self.entries[unit] = {
            "status": status,
            "finished_at": time.time(),
            **metrics,
        }
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(self.entries, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def metrics(self) -> dict[str, dict]:
        return dict(self.entries)
