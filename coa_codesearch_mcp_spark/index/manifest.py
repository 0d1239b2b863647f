"""Segment manifest: atomic snapshot commits + per-partition lineage.

Emulates the Iceberg snapshot/commit contract on plain Parquet (no
Iceberg runtime in this container; at production scale these tables
would be Iceberg and the commit would be a snapshot — reference
analog: Lucene's per-batch ``writer.Commit()``,
Services/Lucene/LuceneIndexService.cs:668-698).

Protocol:
- work units write their output under ``<root>/<stage>/<unit_id>/``
  (parquet), then the driver records the unit in the manifest with
  lineage (inputs, row counts, timings) and atomically replaces
  ``manifest.json`` (write tmp + os.replace — atomic on POSIX).
- a resumed build reads the manifest and skips completed units
  (north rule: resume without re-tokenizing completed partitions).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any


@dataclass
class Manifest:
    root: str
    data: dict = field(default_factory=dict)

    @property
    def path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    @classmethod
    def load_or_create(cls, root: str) -> "Manifest":
        m = cls(root)
        if os.path.exists(m.path):
            with open(m.path) as f:
                m.data = json.load(f)
        else:
            m.data = {
                "format_version": 1,
                "created_at": time.time(),
                "snapshots": [],
                "stages": {},
                "stats": {},
            }
        return m

    def commit(self) -> None:
        """Atomic snapshot commit (tmp + rename)."""
        os.makedirs(self.root, exist_ok=True)
        self.data["snapshots"].append(
            {"id": len(self.data["snapshots"]) + 1, "ts": time.time()}
        )
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1)
        os.replace(tmp, self.path)

    # ---- stage / unit tracking ----

    def stage(self, name: str) -> dict:
        return self.data["stages"].setdefault(name, {"units": {}})

    def completed_units(self, stage: str) -> set[str]:
        return set(self.stage(stage)["units"])

    def record_unit(
        self, stage: str, unit_id: str, lineage: dict[str, Any]
    ) -> None:
        self.stage(stage)["units"][str(unit_id)] = {
            "ts": time.time(),
            **lineage,
        }

    def set_stats(self, key: str, value: Any) -> None:
        self.data["stats"][key] = value

    def get_stats(self, key: str, default: Any = None) -> Any:
        return self.data["stats"].get(key, default)
