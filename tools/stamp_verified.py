"""Stamp the source+oracle hash that earned each query's last green
external check into ``VERIFIED_HASHES.json``.

Run at ROUND START, before any source edits: at that moment the
working tree is exactly what the driver verified, so for every query
whose LATEST CORRECTNESS_r*.json verdict is green we can record the
current :func:`registry.spec_source_hash` as "this is the version the
driver blessed".  Merge semantics:

- green-latest + stamp matches current hash  -> refresh (no-op)
- green-latest + NO stamp yet                -> bootstrap-stamp current
- green-latest + stamp differs               -> stamp CURRENT hash only
  if the green row came from the newest round file (the driver just
  re-verified this source); otherwise keep the OLD stamp — the edit
  happened after the green row and must re-queue.
- red-latest / never-checked                 -> leave untouched

``registry.rotated_queries`` then queues any query whose current hash
differs from its stamp right behind failed-last ones, closing the
modified-since-verified rotation gap (round-6 judge item #1).

Usage: python tools/stamp_verified.py [artifact_dir=/root/repo]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def stamp(artifact_dir: str) -> dict[str, str]:
    sys.path.insert(0, str(Path(artifact_dir)))
    from reddit_can_bigdata_spark import registry

    registry._ensure_loaded()
    out_path = Path(artifact_dir) / "VERIFIED_HASHES.json"
    stamped: dict[str, str] = (
        json.loads(out_path.read_text()) if out_path.exists() else {}
    )

    # latest verdict per query + which round file produced it
    latest: dict[str, tuple[bool, int]] = {}
    files = registry._round_files(artifact_dir)
    for rno, path in enumerate(files):
        rows = json.loads(path.read_text())
        if not isinstance(rows, dict):
            continue
        for name, res in rows.items():
            ok = isinstance(res, dict) and all(
                res.get(k, False)
                for k in ("rows_match", "schema_match", "hash_match")
            )
            latest[name] = (ok, rno)

    newest = len(files) - 1
    changed = 0
    for name, spec in registry.REGISTRY.items():
        ok, rno = latest.get(name, (False, -1))
        if not ok:
            continue
        cur = registry.spec_source_hash(spec)
        if name not in stamped or rno == newest:
            if stamped.get(name) != cur:
                changed += 1
            stamped[name] = cur
        # else: keep the old stamp; a differing current hash means the
        # source was edited after the green row -> must re-queue.

    out_path.write_text(json.dumps(stamped, indent=1, sort_keys=True) + "\n")
    print(
        f"stamped {len(stamped)} queries ({changed} new/updated) -> {out_path}"
    )
    return stamped


if __name__ == "__main__":
    stamp(sys.argv[1] if len(sys.argv) > 1 else "/root/repo")
