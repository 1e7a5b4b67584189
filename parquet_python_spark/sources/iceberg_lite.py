"""Iceberg-style table layout (lite): immutable data files + snapshot
manifests, JSON-encoded.

The north rule targets "Iceberg tables of pre-tokenized training sequences".
A real Iceberg catalog isn't available in this container, so this module
implements the structural pieces the engine actually consumes from Iceberg:

  * a table = a directory of immutable parquet data files,
  * a snapshot = a manifest pinning the exact file set (names + sizes +
    row counts) at a point in the table's history,
  * snapshot ids recorded in per-partition lineage, enabling reproducible
    re-reads (time travel) and resume keyed to the input state.

Determinism: snapshot ids are content hashes (file names + sizes +
mtime_ns, so in-place rewrites are new states), and history is a
parent-pointer chain with a sequence number — no generation-time
wall-clock, so tests and checkpoint/resume are reproducible for a fixed
on-disk file set.

Layout under <table>/_iceberg/ (underscore-prefixed so Spark's parquet
file index ignores it when the table dir is read directly):
    snap-<id>.json   {"snapshot_id", "sequence", "parent", "files":[{path,size,rows}]}
    current          text file holding the current snapshot id
"""

from __future__ import annotations

import hashlib
import json
import os

__all__ = [
    "write_snapshot",
    "current_snapshot_id",
    "read_snapshot",
    "snapshot_files",
]


def _meta_dir(table_path: str) -> str:
    return os.path.join(table_path, "_iceberg")


def _data_files(table_path: str) -> list[dict]:
    out = []
    for name in sorted(os.listdir(table_path)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(table_path, name)
        st = os.stat(full)
        entry = {"path": name, "size": st.st_size, "mtime_ns": st.st_mtime_ns}
        try:
            import pyarrow.parquet as pq

            entry["rows"] = pq.ParquetFile(full).metadata.num_rows
        except Exception:  # noqa: BLE001  (rows are advisory stats)
            entry["rows"] = None
        out.append(entry)
    return out


def write_snapshot(table_path: str) -> str:
    """Snapshot the table's current file set; returns the snapshot id.

    Idempotent: snapshotting an unchanged table returns the existing id
    without writing a new manifest.
    """
    files = _data_files(table_path)
    h = hashlib.sha1()
    for f in files:
        # mtime_ns folded in: an in-place rewrite (same name+size) is a new
        # table state and must produce a new snapshot id
        h.update(f"{f['path']}:{f['size']}:{f['mtime_ns']}".encode())
    snap_id = h.hexdigest()[:16]

    meta = _meta_dir(table_path)
    os.makedirs(meta, exist_ok=True)
    parent = current_snapshot_id(table_path)
    if parent == snap_id:
        return snap_id
    sequence = 0
    if parent is not None:
        sequence = read_snapshot(table_path, parent)["sequence"] + 1
    manifest = {
        "snapshot_id": snap_id,
        "sequence": sequence,
        "parent": parent,
        "files": files,
    }
    path = os.path.join(meta, f"snap-{snap_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, path)
    cur_tmp = os.path.join(meta, "current.tmp")
    with open(cur_tmp, "w") as f:
        f.write(snap_id)
    os.rename(cur_tmp, os.path.join(meta, "current"))
    return snap_id


def current_snapshot_id(table_path: str) -> str | None:
    cur = os.path.join(_meta_dir(table_path), "current")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return f.read().strip()


def read_snapshot(table_path: str, snapshot_id: str | None = None) -> dict:
    snapshot_id = snapshot_id or current_snapshot_id(table_path)
    if snapshot_id is None:
        raise FileNotFoundError(f"no snapshot in {table_path}")
    with open(os.path.join(_meta_dir(table_path), f"snap-{snapshot_id}.json")) as f:
        return json.load(f)


def snapshot_files(table_path: str, snapshot_id: str | None = None) -> list[str]:
    """Absolute data-file paths pinned by a snapshot (time travel when an
    older snapshot_id is passed)."""
    manifest = read_snapshot(table_path, snapshot_id)
    return [os.path.join(table_path, f["path"]) for f in manifest["files"]]
