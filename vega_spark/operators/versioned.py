"""Versioned table snapshots with time travel — the lakehouse
read-consistency primitive (Delta/Iceberg-style snapshot isolation)
expressed with plain Spark writers + an atomic manifest pointer.

Layout of a versioned table directory::

    table_dir/
      v00001/ ... v0000N/     immutable snapshot data dirs (parquet)
      _manifest/00001.json …  one manifest per committed version
      _latest                 atomic pointer file: the current version

Commit protocol (crash-safe without a lock service, single-writer):
write the new snapshot dir FULLY, then its manifest, then atomically
replace ``_latest`` via rename — a reader that resolves ``_latest``
always sees a completely-written snapshot; a crashed commit leaves
only unreferenced dirs (cleaned by vacuum). This is exactly the
commit ordering real table formats use; on object storage the rename
becomes a conditional put, and multi-writer tables add a log/lock —
documented out of scope here.

Capability superset: the reference has no storage/versioning layer
(its only sink is save_as_text_file, SURVEY.md §2.2 /
src/rdd/rdd.rs:254-272).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifest")


def _latest_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_latest")


def current_version(table_dir: str) -> int | None:
    """The committed version ``_latest`` points at, or None for an
    empty/uninitialized table."""
    try:
        with open(_latest_path(table_dir)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def commit_snapshot(df: DataFrame, table_dir: str,
                    note: str = "") -> int:
    """Write ``df`` as the next immutable version of ``table_dir``
    and atomically advance the ``_latest`` pointer. Returns the new
    version number. The data write is a normal distributed parquet
    write (any size); only the manifest/pointer steps are driver-side
    metadata ops."""
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)
    v = (current_version(table_dir) or 0) + 1
    data_dir = os.path.join(table_dir, f"v{v:05d}")
    df.write.mode("errorifexists").parquet(data_dir)
    n_files = len([f for f in os.listdir(data_dir)
                   if f.endswith(".parquet")])
    manifest = {
        "version": v, "data_dir": f"v{v:05d}", "n_files": n_files,
        "committed_at": time.time(), "note": note,
        "schema": df.schema.simpleString(),
    }
    mpath = os.path.join(_manifest_dir(table_dir), f"{v:05d}.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    # atomic pointer flip: readers see the old or new version, never
    # a half-commit
    tmp = _latest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, _latest_path(table_dir))
    return v


def read_snapshot(spark: SparkSession, table_dir: str,
                  version: int | None = None) -> DataFrame:
    """Time-travel read: the table as of ``version`` (default: the
    current ``_latest``). Raises for unknown versions — a reader must
    never silently fall forward/back."""
    v = version if version is not None else current_version(table_dir)
    if v is None:
        raise ValueError(f"{table_dir}: no committed version")
    mpath = os.path.join(_manifest_dir(table_dir), f"{v:05d}.json")
    if not os.path.exists(mpath):
        raise ValueError(f"{table_dir}: version {v} does not exist")
    with open(mpath) as f:
        manifest = json.load(f)
    return spark.read.parquet(
        os.path.join(table_dir, manifest["data_dir"]))


def history(spark: SparkSession, table_dir: str) -> DataFrame:
    """Commit history as a DataFrame (version, n_files, note,
    is_current) — the DESCRIBE HISTORY surface."""
    cur = current_version(table_dir)
    rows = []
    for name in sorted(os.listdir(_manifest_dir(table_dir))):
        with open(os.path.join(_manifest_dir(table_dir), name)) as f:
            m = json.load(f)
        rows.append((m["version"], m["n_files"], m.get("note", ""),
                     m["version"] == cur))
    return spark.createDataFrame(
        rows, "version int, n_files int, note string, is_current boolean")


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop snapshot data dirs older than the last ``keep_last``
    versions (manifests are kept — history stays auditable, data
    becomes unreadable). Never touches the current version. Returns
    the vacuumed version numbers."""
    import shutil

    cur = current_version(table_dir)
    if cur is None:
        return []
    versions = sorted(
        int(n.split(".")[0]) for n in os.listdir(_manifest_dir(table_dir)))
    keep = set(versions[-keep_last:]) | {cur}
    dropped = []
    for v in versions:
        if v in keep:
            continue
        d = os.path.join(table_dir, f"v{v:05d}")
        if os.path.isdir(d):
            shutil.rmtree(d)
            dropped.append(v)
    return dropped
