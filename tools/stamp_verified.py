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

Round-start precondition, ENFORCED (round-8 advice): the newest-round
re-stamp is only sound if the working tree still matches the commit
that produced the newest CORRECTNESS file. If sources changed since
(committed or dirty), stamping would bless EDITED, unverified code and
silently defeat the re-queue this tool implements — so the tool
refuses, unless ``--force`` (for the rare case where the operator
knows the edits don't affect any green query).

Usage: python tools/stamp_verified.py [artifact_dir=/root/repo] [--force]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path


def tree_matches_round_commit(artifact_dir: str, newest_file: Path) -> tuple[bool, str]:
    """Does the working tree's engine source match the commit that last
    touched ``newest_file``? Returns (ok, explanation)."""
    def _git(*args: str) -> subprocess.CompletedProcess:
        return subprocess.run(
            ["git", *args],
            cwd=artifact_dir,
            capture_output=True,
            text=True,
            timeout=30,
        )

    try:
        inside = _git("rev-parse", "--is-inside-work-tree")
        if inside.returncode != 0 or inside.stdout.strip() != "true":
            return False, "not a git checkout"
        commit = _git("log", "-n1", "--format=%H", "--", newest_file.name).stdout.strip()
        if not commit:
            # An UNTRACKED round artifact (the driver just wrote it,
            # nobody committed yet) is the normal round-start state —
            # the guard question is still only "do the engine sources
            # match what the driver verified?", which for an untracked
            # artifact means: unchanged vs HEAD (round-9 advice fix).
            if newest_file.exists():
                # `git diff HEAD` misses untracked files, so also
                # require a clean status over the engine sources
                status = _git(
                    "status", "--porcelain", "--",
                    "reddit_can_bigdata_spark", "__spark_entry__.py",
                )
                if status.stdout.strip():
                    return False, (
                        f"{newest_file.name} is untracked and engine "
                        f"sources have uncommitted changes:\n"
                        f"{status.stdout.strip()}"
                    )
                commit = "HEAD"
            else:
                return False, f"{newest_file.name} has no commit history"
        diff_res = _git(
            "diff", "--stat", commit, "--",
            "reddit_can_bigdata_spark", "__spark_entry__.py",
        )
        if diff_res.returncode != 0:
            return False, f"git diff vs {commit} failed: {diff_res.stderr.strip()}"
        diff = diff_res.stdout.strip()
        if diff:
            return False, (
                f"engine sources differ from {commit[:12]} (the commit that "
                f"recorded {newest_file.name}):\n{diff}"
            )
        return True, commit[:12]
    except Exception as e:  # no git / detached dir: fail safe (refuse)
        return False, f"could not establish round commit: {e!r}"


def stamp(artifact_dir: str, force: bool = False) -> dict[str, str]:
    sys.path.insert(0, str(Path(artifact_dir)))
    from reddit_can_bigdata_spark import registry

    registry._ensure_loaded()
    out_path = Path(artifact_dir) / "VERIFIED_HASHES.json"
    stamped: dict = (
        json.loads(out_path.read_text()) if out_path.exists() else {}
    )
    # Stamps from an older hash ALGORITHM are incomparable with current
    # hashes — keeping them would mark every query "edited"; discard
    # and re-bootstrap under the current version (registry.HASH_VERSION).
    if stamped.get(registry._VERSION_KEY) != registry.HASH_VERSION:
        stamped = {}

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
    tree_ok = True
    if files:
        tree_ok, why = tree_matches_round_commit(artifact_dir, files[-1])
        if not tree_ok and not force:
            raise SystemExit(
                "REFUSING to stamp: working tree no longer matches the "
                f"round that produced {files[-1].name} — stamping now "
                "would bless edited, unverified source and defeat the "
                f"modified-since-green re-queue. Detail: {why}\n"
                "Run at round start (before edits), or pass --force."
            )
        if not tree_ok:
            print(f"WARNING (--force): {why}", file=sys.stderr)

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

    stamped[registry._VERSION_KEY] = registry.HASH_VERSION
    out_path.write_text(json.dumps(stamped, indent=1, sort_keys=True) + "\n")
    print(
        f"stamped {len(stamped)} queries ({changed} new/updated) -> {out_path}"
    )
    return stamped


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    force = "--force" in args
    if force:
        args.remove("--force")
    stamp(args[0] if args else "/root/repo", force=force)
