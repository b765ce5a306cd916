"""Iceberg-style snapshot commits for the postings sink (A11/A12).

No Iceberg runtime jar is available offline, so this module implements the
part of the table format the engine actually relies on, with the same
commit protocol Iceberg uses (public spec: data files are immutable and
append-only; a snapshot is a manifest listing exactly the files that make
up a table version; a commit atomically swaps a current-snapshot pointer):

* data files are only ever ADDED — the delta-merge finalize writes new
  chunk files and never rewrites or deletes committed ones;
* ``snap-<id>.json`` records the file list of one index version, each file
  tagged with its ``term_pref`` so QUERY-TIME PRUNING IS MANIFEST-DRIVEN
  (files of non-matching prefixes are never opened — Iceberg's
  partition-summary pruning, done driver-side);
* ``current`` is flipped by atomic rename AFTER files and snapshot are
  durable: a crash anywhere before the flip leaves readers on the old
  version (orphan files are garbage-collected by :func:`vacuum`);
* corpus stats (n_docs/avgdl) live INSIDE the snapshot, so time-traveling
  a reader to an old snapshot scores with that version's statistics —
  the stats-free chunk format (index/format.py) is what makes old chunk
  files remain valid verbatim.

Single-writer assumption (one build/finalize at a time), as with any
filesystem-catalog Iceberg table.
"""

from __future__ import annotations

import json
import os
import time


def _snap_dir(index_path: str) -> str:
    return os.path.join(index_path, "snapshots")


def _walk_postings(index_path: str) -> set[str]:
    """Relative paths of all postings data files currently on disk."""
    root = os.path.join(index_path, "postings")
    out: set[str] = set()
    if not os.path.isdir(root):
        return out
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                out.add(os.path.relpath(os.path.join(dirpath, f), index_path))
    return out


def _pref_of(relpath: str) -> int:
    for part in relpath.split(os.sep):
        if part.startswith("term_pref="):
            return int(part.split("=", 1)[1])
    return -1


def current_snapshot_id(index_path: str) -> int | None:
    p = os.path.join(_snap_dir(index_path), "current")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def read_snapshot(index_path: str, snapshot_id: int | None = None) -> dict | None:
    sid = snapshot_id if snapshot_id is not None else current_snapshot_id(index_path)
    if sid is None:
        return None
    with open(os.path.join(_snap_dir(index_path), f"snap-{sid}.json")) as f:
        return json.load(f)


def list_snapshots(index_path: str) -> list[int]:
    d = _snap_dir(index_path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[len("snap-") : -len(".json")])
        for f in os.listdir(d)
        if f.startswith("snap-") and f.endswith(".json")
    )


def commit_snapshot(
    index_path: str,
    files: set[str],
    stats: dict,
    operation: str,
    extra: dict | None = None,
) -> dict:
    """Write snap-<id>.json for ``files`` then atomically flip ``current``.

    Call ONLY after every file in ``files`` is durably written. Everything
    before the final ``os.replace`` is invisible to readers. ``extra``
    merges additional version-scoped keys into the snapshot (e.g. the purge
    commit records its own ``docmap`` version directory).
    """
    d = _snap_dir(index_path)
    os.makedirs(d, exist_ok=True)
    parent = current_snapshot_id(index_path)
    sid = (parent or 0) + 1
    snap = {
        "id": sid,
        "parent": parent,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        "operation": operation,
        "stats": stats,
        "files": {p: _pref_of(p) for p in sorted(files)},
        **(extra or {}),
    }
    with open(os.path.join(d, f"snap-{sid}.json"), "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    tmp = os.path.join(d, f".current.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        f.write(str(sid))
    os.replace(tmp, os.path.join(d, "current"))  # the atomic commit point
    return snap


def snapshot_files(
    index_path: str, snapshot_id: int | None = None, prefs: list[int] | None = None
) -> list[str]:
    """Absolute data-file paths of a snapshot, manifest-pruned to the given
    term_pref values (None = all files)."""
    snap = read_snapshot(index_path, snapshot_id)
    if snap is None:
        raise FileNotFoundError(f"no snapshot in {index_path}")
    want = None if prefs is None else set(prefs)
    return [
        os.path.join(index_path, p)
        for p, pref in snap["files"].items()
        if want is None or pref in want
    ]


def vacuum(index_path: str, keep_snapshots: int = 1) -> list[str]:
    """Expire all but the newest ``keep_snapshots`` snapshots and delete
    data files referenced by NO remaining snapshot (Iceberg's
    expire_snapshots + remove_orphan_files). Returns removed file paths."""
    sids = list_snapshots(index_path)
    keep = set(sids[-max(keep_snapshots, 1) :])
    cur = current_snapshot_id(index_path)
    if cur is not None:
        keep.add(cur)
    live: set[str] = set()
    for sid in keep:
        snap = read_snapshot(index_path, sid)
        live.update(snap["files"])
    removed = []
    for rel in sorted(_walk_postings(index_path) - live):
        full = os.path.join(index_path, rel)
        os.unlink(full)
        removed.append(full)
    for sid in sids:
        if sid not in keep:
            os.unlink(os.path.join(_snap_dir(index_path), f"snap-{sid}.json"))
    return removed
