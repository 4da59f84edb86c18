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

import datetime
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def _enc_stat(v):
    """JSON-encode one min/max cell; temporal types get a type tag so
    decode restores a comparable Python value."""
    if isinstance(v, datetime.datetime):
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"t": "d", "v": v.isoformat()}
    return v


def _dec_stat(v):
    if isinstance(v, dict):
        if v.get("t") == "ts":
            return datetime.datetime.fromisoformat(v["v"])
        if v.get("t") == "d":
            return datetime.date.fromisoformat(v["v"])
    return v


def _collect_file_stats(df_back: DataFrame,
                        stats_cols: list[str]) -> dict[str, dict]:
    """Per-file min/max for ``stats_cols`` via the ``_metadata``
    column — ONE distributed pass over the freshly written snapshot,
    reduced to an (n_files x n_cols) frame before collect. This is the
    Delta-log per-file stats model: the driver-side object is bounded
    by file count, never row count."""
    aggs = []
    for c in stats_cols:
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
    rows = (df_back
            .groupBy(F.col("_metadata.file_path").alias("__path"))
            .agg(*aggs)
            .collect())
    out: dict[str, dict] = {}
    for r in rows:
        d = r.asDict()
        fname = os.path.basename(d.pop("__path"))
        out[fname] = {
            c: {"min": _enc_stat(d[f"{c}__min"]),
                "max": _enc_stat(d[f"{c}__max"])}
            for c in stats_cols
        }
    return out


def commit_snapshot(df: DataFrame, table_dir: str,
                    note: str = "",
                    stats_cols: list[str] | None = None) -> int:
    """Write ``df`` as the next immutable version of ``table_dir``
    and atomically advance the ``_latest`` pointer. Returns the new
    version number. The data write is a normal distributed parquet
    write (any size); only the manifest/pointer steps are driver-side
    metadata ops.

    ``stats_cols``: collect per-file min/max for these columns into
    the manifest (one extra distributed pass over the snapshot), which
    ``read_snapshot_pruned`` then uses for metadata-only data
    skipping. Pair with ``repartitionByRange`` on the same columns so
    file ranges are disjoint and the skip rate is high."""
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
    if stats_cols:
        back = df.sparkSession.read.parquet(data_dir)
        manifest["stats_cols"] = list(stats_cols)
        manifest["file_stats"] = _collect_file_stats(back, list(stats_cols))
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


def _load_manifest(table_dir: str, version: int | None) -> dict:
    v = version if version is not None else current_version(table_dir)
    if v is None:
        raise ValueError(f"{table_dir}: no committed version")
    mpath = os.path.join(_manifest_dir(table_dir), f"{v:05d}.json")
    if not os.path.exists(mpath):
        raise ValueError(f"{table_dir}: version {v} does not exist")
    with open(mpath) as f:
        return json.load(f)


def plan_pruned_files(table_dir: str,
                      ranges: dict[str, tuple],
                      version: int | None = None) -> tuple[list[str], int]:
    """Metadata-only data skipping: given closed-interval predicates
    ``{col: (lo, hi)}`` (None = unbounded on that side), return the
    snapshot files whose [min, max] stats intersect EVERY interval,
    plus the total file count. Runs entirely on the manifest — O(file
    count) on the driver, zero scans, exactly the Delta/Iceberg skip
    model. Files without stats for a predicated column are kept
    (pruning must stay conservative)."""
    m = _load_manifest(table_dir, version)
    files = sorted(m.get("file_stats", {}).items())
    data_dir = os.path.join(table_dir, m["data_dir"])
    if not files:
        # stats were not collected: every data file survives
        all_files = sorted(f for f in os.listdir(data_dir)
                           if f.endswith(".parquet"))
        return [os.path.join(data_dir, f) for f in all_files], len(all_files)
    kept = []
    for fname, stats in files:
        keep = True
        for col, (lo, hi) in ranges.items():
            st = stats.get(col)
            if st is None:
                continue
            fmin, fmax = _dec_stat(st["min"]), _dec_stat(st["max"])
            if fmin is None or fmax is None:
                continue
            if lo is not None and fmax < lo:
                keep = False
                break
            if hi is not None and fmin > hi:
                keep = False
                break
        if keep:
            kept.append(os.path.join(data_dir, fname))
    return kept, len(files)


def read_snapshot_pruned(spark: SparkSession, table_dir: str,
                         ranges: dict[str, tuple],
                         version: int | None = None) -> DataFrame:
    """Time-travel read with data skipping: resolve the manifest,
    drop files whose min/max stats exclude the ``ranges`` predicate,
    scan only the survivors, and re-apply the predicate as a row
    filter (file stats prune, they do not filter — correctness never
    depends on the stats). At cluster scale the file list comes from
    the manifest, so a selective predicate turns a full-table scan
    into a handful of file reads before the first task launches."""
    kept, _total = plan_pruned_files(table_dir, ranges, version)
    if not kept:
        base = read_snapshot(spark, table_dir, version)
        return base.filter(F.lit(False))
    df = spark.read.parquet(*kept)
    for col, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(col) <= F.lit(hi))
    return df


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


# --- per-file Bloom index (point-lookup data skipping) ---------------------

def _bloom_positions(value, m_bits: int, k: int) -> list[int]:
    """k md5 bit positions for a value — identical math in Python
    (plan-time probe), Spark SQL (build), and any oracle: position_i =
    int(md5("{value}:{i}")[:12hex], 16) % m_bits."""
    import hashlib

    return [int(hashlib.md5(f"{value}:{i}".encode()).hexdigest()[:12],
                16) % m_bits
            for i in range(k)]


def _collect_file_blooms(df_back: DataFrame, col: str,
                         m_bits: int, k: int) -> dict[str, dict]:
    """Per-file Bloom word maps in one distributed pass: explode each
    row's k md5 positions, OR the 64-bit word masks per (file, word)
    — the shuffle carries only set words (≤ files x m_bits/64 rows),
    and the driver-side manifest entry is the sparse {word: mask}
    dict per file."""
    c = F.col(col).cast("string")
    pos = [(F.conv(F.substring(
        F.md5(F.concat_ws(":", c, F.lit(str(i)))), 1, 12), 16, 10)
        .cast("long") % m_bits)
        for i in range(k)]
    bits = (df_back.select(
        F.col("_metadata.file_path").alias("__path"),
        F.explode(F.array(*[
            F.struct((p / 64).cast("int").alias("w"),
                     F.pmod(p, F.lit(64)).cast("int").alias("b"))
            for p in pos])).alias("x")))
    words = (bits.select(
        "__path", "x.w",
        F.expr("shiftleft(CAST(1 AS BIGINT), x.b)").alias("m"))
        .groupBy("__path", "w").agg(F.bit_or("m").alias("m"))
        .collect())
    out: dict[str, dict] = {}
    for r in words:
        out.setdefault(os.path.basename(r["__path"]), {})[str(r["w"])] \
            = int(r["m"])
    return out


def add_bloom_index(spark: SparkSession, table_dir: str, col: str,
                    m_bits: int = 1 << 14, k: int = 3,
                    version: int | None = None) -> int:
    """Attach a per-file Bloom index on ``col`` to an existing
    snapshot's manifest (one distributed pass over that snapshot).
    Complements min/max stats: ranges prune range predicates, blooms
    prune POINT lookups even when the layout isn't sorted on the
    key. Returns the indexed version."""
    m = _load_manifest(table_dir, version)
    v = m["version"]
    back = spark.read.parquet(os.path.join(table_dir, m["data_dir"]))
    m.setdefault("bloom", {})[col] = {
        "m_bits": m_bits, "k": k,
        "files": _collect_file_blooms(back, col, m_bits, k)}
    mpath = os.path.join(_manifest_dir(table_dir), f"{v:05d}.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, mpath)
    return v


def plan_bloom_files(table_dir: str, col: str, value,
                     version: int | None = None) -> tuple[list[str], int]:
    """Metadata-only point-lookup skip: keep files whose Bloom words
    have ALL k bits of ``value`` set (no false negatives — a file
    without the key can survive only at the Bloom FP rate; a file
    with it always survives). Files or columns without an index are
    kept conservatively."""
    m = _load_manifest(table_dir, version)
    data_dir = os.path.join(table_dir, m["data_dir"])
    all_files = sorted(f for f in os.listdir(data_dir)
                       if f.endswith(".parquet"))
    idx = m.get("bloom", {}).get(col)
    if idx is None:
        return [os.path.join(data_dir, f) for f in all_files], len(all_files)
    pos = _bloom_positions(value, idx["m_bits"], idx["k"])
    kept = []
    for fname in all_files:
        words = idx["files"].get(fname)
        if words is None:
            kept.append(os.path.join(data_dir, fname))
            continue
        ok = True
        for p in pos:
            w = words.get(str(p // 64), 0)
            if not (w >> (p % 64)) & 1:
                ok = False
                break
        if ok:
            kept.append(os.path.join(data_dir, fname))
    return kept, len(all_files)


def read_snapshot_point(spark: SparkSession, table_dir: str,
                        col: str, value,
                        version: int | None = None) -> DataFrame:
    """Point-lookup read through the Bloom index: scan only files
    that may contain ``value``, then apply the exact equality filter
    (the index prunes, the filter decides — correctness never
    depends on the index)."""
    kept, _total = plan_bloom_files(table_dir, col, value, version)
    if not kept:
        return read_snapshot(spark, table_dir, version) \
            .filter(F.lit(False))
    return (spark.read.parquet(*kept)
            .filter(F.col(col) == F.lit(value)))


def change_feed(spark: SparkSession, table_dir: str,
                from_version: int, to_version: int,
                keys: list[str],
                compare_cols: list[str] | None = None) -> DataFrame:
    """CHANGE DATA FEED between two committed versions: one row per
    key whose state differs, tagged insert / delete / update, with
    the new-side values attached for insert/update (a downstream sync
    applies the feed with `merge.apply_changes`). Built on the
    digest-reduced diff (`merge.table_diff`): the version exchange
    carries (keys, 64-bit digest), never row payloads, so diffing two
    100 TB snapshots costs one keyed shuffle of the key space; only
    the changed keys' rows are fetched back (semi-join on the
    bounded change set)."""
    from vega_spark.operators.merge import table_diff

    old = read_snapshot(spark, table_dir, from_version)
    new = read_snapshot(spark, table_dir, to_version)
    diff = table_diff(old, new, keys, compare_cols)
    changes = diff.select(
        *keys,
        F.when(F.col("change_type") == "inserted", F.lit("insert"))
        .when(F.col("change_type") == "deleted", F.lit("delete"))
        .otherwise(F.lit("update")).alias("op"))
    payload = new.join(
        changes.filter(F.col("op") != "delete").select(*keys),
        keys, "semi")
    upserts = changes.filter(F.col("op") != "delete") \
        .join(payload, keys)
    deletes = changes.filter(F.col("op") == "delete")
    for c in payload.columns:
        if c not in keys:
            deletes = deletes.withColumn(
                c, F.lit(None).cast(dict(payload.dtypes)[c]))
    return upserts.unionByName(deletes)


def delete_keys(spark: SparkSession, table_dir: str, col: str,
                values: list, note: str = "delete") -> dict:
    """Targeted DELETE (the right-to-be-forgotten path): remove all
    rows whose ``col`` is in ``values`` by rewriting ONLY the files
    that can contain those keys — planned from the manifest's Bloom
    index (falling back to min/max stats, then to all files) — and
    HARD-LINKING every untouched file into the new version
    unchanged. Copy-on-write at file granularity: a delete of a few
    keys from a 100 TB table costs a scan of the few affected files,
    zero bytes moved for the rest, and the old version stays intact
    for time travel until vacuumed.

    Index carry-over keeps reads fast without a rebuild: linked
    files keep their min/max and Bloom entries verbatim; rewritten
    files get fresh min/max, and keep their OLD Bloom entry — a
    Bloom of a superset can only add false positives, never a false
    negative, so pruning stays correct (rebuild with
    ``add_bloom_index`` to re-tighten). Returns
    {"version", "rewritten", "linked", "deleted_rows"}."""
    import shutil

    m = _load_manifest(table_dir, None)
    old_v, old_dir = m["version"], os.path.join(table_dir, m["data_dir"])
    # plan affected files: bloom per value, else min/max, else all
    affected: set[str] = set()
    if col in m.get("bloom", {}):
        for v in values:
            kept, _ = plan_bloom_files(table_dir, col, v)
            affected |= {os.path.basename(p) for p in kept}
    elif col in m.get("stats_cols", []):
        for v in values:
            kept, _ = plan_pruned_files(table_dir, {col: (v, v)})
            affected |= {os.path.basename(p) for p in kept}
    else:
        affected = {f for f in os.listdir(old_dir)
                    if f.endswith(".parquet")}
    all_files = sorted(f for f in os.listdir(old_dir)
                       if f.endswith(".parquet"))
    linked = [f for f in all_files if f not in affected]

    new_v = old_v + 1
    new_dir = os.path.join(table_dir, f"v{new_v:05d}")
    os.makedirs(new_dir)
    for f in linked:
        src, dst = os.path.join(old_dir, f), os.path.join(new_dir, f)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy(src, dst)
    deleted = 0
    rewritten_names: list[str] = []
    if affected:
        aff_paths = [os.path.join(old_dir, f) for f in sorted(affected)]
        src_df = spark.read.parquet(*aff_paths)
        keep = src_df.filter(~F.col(col).isin(values))
        deleted = src_df.count() - keep.count()
        tmp = new_dir + ".rw"
        keep.write.mode("overwrite").parquet(tmp)
        for i, f in enumerate(sorted(os.listdir(tmp))):
            if not f.endswith(".parquet"):
                continue
            name = f"rw-{i:05d}.parquet"
            shutil.move(os.path.join(tmp, f),
                        os.path.join(new_dir, name))
            rewritten_names.append(name)
        shutil.rmtree(tmp)

    manifest = {
        "version": new_v, "data_dir": f"v{new_v:05d}",
        "n_files": len(linked) + len(rewritten_names),
        "committed_at": time.time(), "note": note,
        "schema": m["schema"],
    }
    # carry indexes: linked files verbatim; rewritten files get fresh
    # min/max (one pass over just those files)
    if m.get("stats_cols"):
        manifest["stats_cols"] = m["stats_cols"]
        stats = {f: m["file_stats"][f] for f in linked
                 if f in m.get("file_stats", {})}
        if rewritten_names:
            back = spark.read.parquet(*[
                os.path.join(new_dir, f) for f in rewritten_names])
            stats.update(_collect_file_stats(back, m["stats_cols"]))
        manifest["file_stats"] = stats
    if m.get("bloom"):
        manifest["bloom"] = {}
        for bcol, idx in m["bloom"].items():
            files = {f: w for f, w in idx["files"].items()
                     if f in set(linked)}
            if rewritten_names:
                # superset blooms for rewrites: OR of the affected
                # files' old blooms (conservative, no false negatives)
                union: dict[str, int] = {}
                for f in sorted(affected):
                    for w, mask in idx["files"].get(f, {}).items():
                        union[w] = union.get(w, 0) | mask
                for name in rewritten_names:
                    files[name] = union
            manifest["bloom"][bcol] = {
                "m_bits": idx["m_bits"], "k": idx["k"], "files": files}
    mpath = os.path.join(_manifest_dir(table_dir), f"{new_v:05d}.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    tmp = _latest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(new_v))
    os.replace(tmp, _latest_path(table_dir))
    return {"version": new_v, "rewritten": len(rewritten_names),
            "linked": len(linked), "deleted_rows": int(deleted)}


def optimize_table(spark: SparkSession, table_dir: str,
                   cluster_by: list[str],
                   n_files: int = 8,
                   bloom_col: str | None = None) -> int:
    """OPTIMIZE for the versioned layer (the Delta/Iceberg compaction
    verb): read the latest snapshot, re-cluster it with
    ``repartitionByRange(cluster_by)`` into ``n_files`` files so
    per-file [min,max] ranges on the cluster keys become DISJOINT
    (small files collapse, data skipping on those keys goes from
    useless to near-perfect), commit the result as a new version
    with fresh file stats, and optionally rebuild the per-file Bloom
    index. Content is untouched — only layout and metadata change.

    One distributed range-shuffle write; manifest/stat work is
    O(file count) driver-side metadata. Returns the new version."""
    df = read_snapshot(spark, table_dir)
    clustered = df.repartitionByRange(n_files, *[F.col(c)
                                                 for c in cluster_by])
    v = commit_snapshot(clustered, table_dir,
                        note=f"optimize cluster_by={cluster_by}",
                        stats_cols=list(cluster_by))
    if bloom_col is not None:
        add_bloom_index(spark, table_dir, bloom_col)
    return v


def tag_version(table_dir: str, tag: str,
                version: int | None = None) -> int:
    """Name a snapshot (Iceberg-style tag): an immutable ref under
    ``_tags/`` pointing at a version — 'v2024-audit', 'prod-baseline'
    — so readers pin datasets by meaning instead of by number.
    Driver-side metadata only; atomic via the same write-then-rename
    discipline as the ``_latest`` pointer. Returns the tagged
    version."""
    v = version if version is not None else current_version(table_dir)
    if v is None or not os.path.isfile(
            os.path.join(_manifest_dir(table_dir), f"{v:05d}.json")):
        raise ValueError(f"no version {v!r} to tag in {table_dir}")
    tdir = os.path.join(table_dir, "_tags")
    os.makedirs(tdir, exist_ok=True)
    safe = tag.replace("/", "_")
    tmp = os.path.join(tdir, safe + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, os.path.join(tdir, safe))
    return v


def read_tag(spark: SparkSession, table_dir: str, tag: str) -> DataFrame:
    """Time travel by NAME: the snapshot a tag points at."""
    path = os.path.join(table_dir, "_tags", tag.replace("/", "_"))
    if not os.path.isfile(path):
        raise ValueError(f"unknown tag {tag!r} in {table_dir}")
    with open(path) as f:
        return read_snapshot(spark, table_dir, int(f.read().strip()))
