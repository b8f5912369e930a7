"""Snapshot-versioned parquet warehouse — Iceberg-semantics table store.

The north_rule targets Iceberg tables; this container image ships no Iceberg
runtime jars, so the engine runs on a minimal table format with the three
Iceberg properties the crawl loop actually relies on:

  1. **Atomic snapshot commit** — data files are written to a fresh
     directory, then a single ``os.replace`` of the manifest JSON publishes
     the snapshot. Readers only ever see the manifest's current state; a
     crashed write leaves an unreferenced directory, never a torn table.
  2. **Snapshot history / lineage** — every commit records
     (snapshot id, epoch, parent, row/partition stats). ``rollback`` and
     resume-from-checkpoint walk this history.
  3. **Idempotent epoch re-commit** — committing the same (table, epoch)
     again *replaces* that epoch's files in the manifest, so a died epoch
     can simply be re-run (same inputs => same outputs; SURVEY.md §7).

On a real cluster, swap this for an Iceberg catalog: ``commit(mode=
'overwrite')`` becomes REPLACE TABLE / MERGE INTO, ``commit(mode='append')``
becomes ``writeTo(...).append()``; the crawl plan is unchanged (it only
talks to this interface). ``try_iceberg()`` returns a real-Iceberg adapter
when the jars are present.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    MANIFEST = "_manifest.json"

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # Per-table schema cache: the crawl loop re-opens the same tables
        # every epoch, and each schema-less spark.read.parquet pays a
        # driver-side footer read + schema merge over the path list. Table
        # schemas here are commit-stable, so the first read's schema is
        # pinned and reused (the Iceberg behavior — schemas come from
        # table metadata, never from data-file inspection).
        self._schemas: dict = {}
        os.makedirs(root, exist_ok=True)

    def _read_parquet(self, name: str, paths: list):
        cached = self._schemas.get(name)
        if cached is not None:
            return self.spark.read.schema(cached).parquet(*paths)
        df = self.spark.read.parquet(*paths)
        self._schemas[name] = df.schema
        return df

    # -- manifest plumbing ---------------------------------------------------

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._table_dir(name), self.MANIFEST)

    def manifest(self, name: str) -> dict | None:
        path = self._manifest_path(name)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def _publish(self, name: str, manifest: dict) -> None:
        """Atomic manifest swap — the commit point."""
        path = self._manifest_path(name)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(tmp, path)  # atomic on POSIX

    def exists(self, name: str) -> bool:
        return self.manifest(name) is not None

    def current_epoch(self, name: str) -> int | None:
        m = self.manifest(name)
        if not m or not m.get("snapshots"):
            return None
        return m["snapshots"][-1]["epoch"]

    # -- I/O ------------------------------------------------------------------

    def read(self, name: str) -> DataFrame:
        m = self.manifest(name)
        if m is None:
            raise FileNotFoundError(f"warehouse table not found: {name}")
        dirs = m["current_dirs"]
        if not dirs:
            raise FileNotFoundError(f"warehouse table empty: {name}")
        return self._read_parquet(
            name, [os.path.join(self._table_dir(name), d) for d in dirs])

    def commit(self, name: str, df: DataFrame, epoch: int,
               mode: str = "overwrite", meta: dict | None = None) -> dict:
        """Write df as a new snapshot of ``name`` for ``epoch``.

        overwrite: snapshot = the new files only (frontier state).
        append:    snapshot = previous files + new files, EXCEPT any files
                   previously appended for this same epoch (idempotent
                   epoch re-run; scan_results/metrics sinks).
        """
        return self._commit_files(
            name, lambda out: df.write.mode("error").parquet(out),
            epoch, mode, meta)

    def commit_local(self, name: str, rows: list, schema, epoch: int,
                     mode: str = "append", meta: dict | None = None) -> dict:
        """Commit driver-resident rows (metrics, log events) WITHOUT a
        Spark job: the rows already live on the driver, so routing them
        through createDataFrame + a write job buys nothing and costs ~1 s
        of serialized wall per commit in local mode (job scheduling +
        Py4J + task overhead — the per-epoch fixed-cost floor). pyarrow
        writes one parquet file with the exact physical types Spark would
        have produced (``schema`` is a pyarrow schema mirroring the table
        StructType), manifest semantics identical to commit() — the
        Iceberg shape, where metadata rows are written by the committer,
        never by a cluster job."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.Table.from_pylist(
            [dict(zip(schema.names, r)) for r in rows], schema=schema)

        def _write(out: str) -> None:
            os.makedirs(out, exist_ok=True)
            pq.write_table(table, os.path.join(out, "part-00000.parquet"),
                           compression="zstd")

        return self._commit_files(name, _write, epoch, mode, meta)

    @staticmethod
    def _peek(m: dict) -> int:
        """The sequence the next commit would receive — the ONE expression
        both _next_seq and peek_seq must share, or the peeked key could
        drift from the assigned one (the key-reuse bug class the counter
        exists to prevent). Falls back to the list length for manifests
        written before the counter existed."""
        return int(m.get("next_seq", len(m["snapshots"])))

    @staticmethod
    def _next_seq(m: dict) -> int:
        """Monotone snapshot sequence, persisted in the manifest: deriving
        it from len(snapshots) breaks once expire_snapshots trims history
        (a re-used sequence number collides with a still-referenced dir)."""
        seq = Warehouse._peek(m)
        m["next_seq"] = seq + 1
        return seq

    def peek_seq(self, name: str) -> int:
        """The sequence number the NEXT commit to ``name`` will receive,
        without consuming it. Callers that need a never-reused epoch KEY
        for an append commit (e.g. event-log flushes) use this instead of
        len(snapshots): the length repeats once expire_snapshots or
        rollback trims history, and a repeated append key makes
        commit(mode='append') silently replace the earlier flush's dirs.
        Driver-side commits are serialized, so the peeked value is exactly
        what _next_seq assigns inside the immediately following commit."""
        m = self.manifest(name)
        if m is None:
            return 0
        return self._peek(m)

    def _commit_files(self, name: str, write_fn, epoch: int, mode: str,
                      meta: dict | None) -> dict:
        tdir = self._table_dir(name)
        os.makedirs(tdir, exist_ok=True)
        m = self.manifest(name) or {"table": name, "snapshots": [],
                                    "current_dirs": [], "epoch_dirs": {}}
        seq = self._next_seq(m)
        data_dir = f"snap-{epoch:06d}-{seq:04d}"
        out_path = os.path.join(tdir, data_dir)
        if os.path.exists(out_path):
            # A dir with this name that the manifest does not reference is by
            # construction an aborted write (crash mid-epoch) or a leftover
            # from a rollback that truncated the snapshot list: sequence
            # numbers only advance at the atomic manifest publish. Remove it
            # so the documented 'a died epoch can simply be re-run' guarantee
            # holds; a *referenced* dir colliding would be manifest
            # corruption, so refuse loudly rather than overwrite.
            referenced = set(m["current_dirs"])
            for snap in m["snapshots"]:
                referenced.update(snap["dirs"])
            if data_dir in referenced:
                raise RuntimeError(
                    f"manifest corruption: next snapshot dir {data_dir} is "
                    f"already referenced by table {name}")
            shutil.rmtree(out_path)
        write_fn(out_path)

        epoch_key = str(epoch)
        if mode == "overwrite":
            current = [data_dir]
            m["epoch_dirs"] = {epoch_key: [data_dir]}
        elif mode == "append":
            stale = set(m["epoch_dirs"].get(epoch_key, []))
            current = [d for d in m["current_dirs"] if d not in stale]
            current.append(data_dir)
            m["epoch_dirs"][epoch_key] = [data_dir]
        else:
            raise ValueError(f"unknown commit mode: {mode}")

        snapshot = {
            "id": data_dir,
            "epoch": epoch,
            "mode": mode,
            "parent": m["snapshots"][-1]["id"] if m["snapshots"] else None,
            "committed_at": time.time(),
            "dirs": current,
            "meta": meta or {},
        }
        m["snapshots"].append(snapshot)
        m["current_dirs"] = current
        self._publish(name, m)
        return snapshot

    def truncate(self, name: str, epoch: int,
                 meta: dict | None = None) -> dict:
        """Metadata-only truncation: publish an overwrite snapshot that
        references ZERO data files — the Iceberg TRUNCATE TABLE shape,
        where the commit is a manifest swap and never a write job. The
        previous route (an empty-DataFrame Spark write) paid ~1 s of job
        scheduling in local mode — fixed wall that shrinks with neither
        cores nor cluster size, charged to every journal compaction.
        After truncation ``current_dirs`` is empty, so read-side guards
        (the journal reconcile's `_journal_df`) skip the table outright
        instead of scanning an empty parquet dir. Crash-safety is
        unchanged: the atomic step was always the manifest publish."""
        m = self.manifest(name)
        if m is None:
            raise FileNotFoundError(f"warehouse table not found: {name}")
        seq = self._next_seq(m)
        snapshot = {
            "id": f"snap-{epoch:06d}-{seq:04d}",
            "epoch": epoch,
            "mode": "overwrite",
            "parent": m["snapshots"][-1]["id"] if m["snapshots"] else None,
            "committed_at": time.time(),
            "dirs": [],
            "meta": meta or {},
        }
        m["snapshots"].append(snapshot)
        m["current_dirs"] = []
        m["epoch_dirs"] = {str(epoch): []}
        self._publish(name, m)
        return snapshot

    def rollback(self, name: str, epoch: int) -> None:
        """Reset the table to the last snapshot at or before ``epoch``."""
        m = self.manifest(name)
        if m is None:
            raise FileNotFoundError(name)
        keep = [s for s in m["snapshots"] if s["epoch"] <= epoch]
        if not keep:
            raise ValueError(f"no snapshot at or before epoch {epoch}")
        m["snapshots"] = keep
        if "buckets" in keep[-1]:
            # Bucketed snapshot: its 'dirs' records only the top-level snap
            # dir IT wrote; the readable state is the bucket map (pointers
            # into earlier snap dirs included). Rebuild current_dirs from it,
            # mirroring commit_bucketed's publish — restoring 'dirs' alone
            # would silently drop every bucket written by earlier snapshots.
            m["buckets"] = keep[-1]["buckets"]
            m["current_dirs"] = sorted({d for dirs in m["buckets"].values()
                                        for d in dirs})
            live = {d for dirs in m["buckets"].values() for d in dirs}
            m["epoch_deltas"] = {
                k: [d for d in v if d in live]
                for k, v in m.get("epoch_deltas", {}).items()
                if int(k) <= epoch}
        else:
            m["current_dirs"] = keep[-1]["dirs"]
        # Keep per-epoch append bookkeeping for every surviving epoch —
        # collapsing it to the last epoch alone would make a later
        # idempotent re-append (or a metrics backfill) treat earlier
        # epochs as never-written and duplicate their rows.
        live = set(m["current_dirs"])
        m["epoch_dirs"] = {
            k: v for k, v in m.get("epoch_dirs", {}).items()
            if int(k) <= epoch and all(d in live for d in v)}
        self._publish(name, m)

    # -- bucketed tables (MERGE INTO analogue) --------------------------------
    #
    # A bucketed table is hash-partitioned by a bucket id (the crawl engine
    # uses pmod(xxhash64(url_hash), B)); the manifest maps each bucket to an
    # ordered LIST of data dirs (one rewritten base + appended deltas) —
    # exactly Iceberg's bucket(url_hash) partition spec with copy-on-write
    # MERGE for updates and fast-append snapshots for inserts:
    #
    #   * rewrite: buckets present in the rewrite frame get their dir list
    #     REPLACED by the new dir (only buckets containing updated rows pay
    #     I/O — the rest of the table is untouched);
    #   * append:  buckets present in the append frame get one delta dir
    #     ADDED (pure insert, zero read/rewrite of existing data);
    #   * compaction: buckets whose dir list exceeds a threshold are folded
    #     into the next rewrite (amortized O(1) dirs per bucket).
    #
    # Epoch cost is therefore O(touched rows + delta churn), never
    # O(table size) — the property the 10^10-row frontier needs.

    BUCKET_COL = "_bucket"

    def read_buckets(self, name: str, bucket_ids=None,
                     exclude_epoch_deltas: int | None = None) -> DataFrame:
        """Read a bucketed table (optionally only the given buckets) —
        bucket-level pruning the way an Iceberg partition filter would.

        ``exclude_epoch_deltas``: skip delta dirs appended for that epoch.
        A re-run of a crashed epoch must read the PRE-epoch state — if the
        crashed attempt's insert deltas stayed visible, the dedup anti-join
        would drop the re-discovered URLs while the re-commit replaces (and
        thereby empties) those delta dirs, losing the rows entirely."""
        m = self.manifest(name)
        if m is None or "buckets" not in m:
            raise FileNotFoundError(f"bucketed table not found: {name}")
        buckets = m["buckets"]
        skip = (set(m.get("epoch_deltas", {}).get(
                    str(exclude_epoch_deltas), []))
                if exclude_epoch_deltas is not None else set())
        ids = (sorted(buckets) if bucket_ids is None
               else [str(b) for b in bucket_ids])
        paths = [os.path.join(self._table_dir(name), d)
                 for b in ids for d in buckets.get(str(b), [])
                 if d not in skip]
        if not paths:
            # Preserve schema for empty selections via an empty frame over
            # any existing dir, else fail (nothing ever committed).
            any_paths = [os.path.join(self._table_dir(name), d)
                         for dirs in buckets.values() for d in dirs]
            if not any_paths:
                raise FileNotFoundError(f"bucketed table empty: {name}")
            return self._read_parquet(name, [any_paths[0]]).limit(0)
        return self._read_parquet(name, paths)

    def bucket_dir_counts(self, name: str) -> dict[int, int]:
        m = self.manifest(name) or {}
        return {int(b): len(d) for b, d in m.get("buckets", {}).items()}

    def table_bytes(self, name: str) -> int | None:
        """Live data bytes of a bucketed table from manifest-recorded file
        stats (the Iceberg-manifest analogue: sizes are captured once at
        commit time, never by listing the store afterwards). Returns None
        when any live dir predates size tracking — callers treat unknown
        as 'large' and skip small-table fast paths."""
        m = self.manifest(name)
        if m is None or "buckets" not in m:
            return None
        sizes = m.get("dir_bytes", {})
        total = 0
        for dirs in m["buckets"].values():
            for d in dirs:
                if d not in sizes:
                    return None
                total += sizes[d]
        return total

    def commit_bucketed(self, name: str, epoch: int, *,
                        rewrite: DataFrame | None = None,
                        append: DataFrame | None = None,
                        meta: dict | None = None) -> dict:
        """Atomically publish one epoch of a bucketed table.

        ``rewrite``/``append`` must carry the ``_bucket`` partition column
        and share one schema (they are unioned into a single write job).
        The rewrite frame is the FULL new content of every bucket it
        contains; the append frame is insert-only rows. Both are written
        with partitionBy(_bucket) in a single job each, then one manifest
        swap publishes the combined state — a crash before the swap leaves
        the table at the previous snapshot (same guarantee as commit()).
        """
        from pyspark.sql import functions as _F

        tdir = self._table_dir(name)
        os.makedirs(tdir, exist_ok=True)
        m = self.manifest(name) or {"table": name, "snapshots": [],
                                    "current_dirs": [], "epoch_dirs": {},
                                    "buckets": {}}
        m.setdefault("buckets", {})
        seq = self._next_seq(m)
        buckets = {b: list(dirs) for b, dirs in m["buckets"].items()}

        data_dir = f"snap-{epoch:06d}-{seq:04d}"
        out_path = os.path.join(tdir, data_dir)
        if os.path.exists(out_path):
            referenced = {d for dirs in m["buckets"].values() for d in dirs}
            for snap in m["snapshots"]:
                for dirs in snap.get("buckets", {}).values():
                    referenced.update(dirs)
            if any(d.startswith(data_dir) for d in referenced):
                raise RuntimeError(
                    f"manifest corruption: {data_dir} already referenced")
            shutil.rmtree(out_path)

        # ONE write job for both sides: a _kind partition column separates
        # the rewrite ('base') rows from the insert ('delta') rows, and a
        # repartition on (_kind, _bucket) clusters rows so each bucket is
        # exactly one file per commit (the Iceberg write-distribution=hash
        # behavior) — without it every task holds every bucket and the
        # commit explodes into tasks*buckets tiny files whose listing cost
        # taxes every later scan.
        parts = []
        if rewrite is not None:
            parts.append(rewrite.withColumn("_kind", _F.lit("base")))
        if append is not None:
            parts.append(append.withColumn("_kind", _F.lit("delta")))
        if not parts:
            raise ValueError("commit_bucketed needs rewrite and/or append")
        combined = parts[0]
        for p in parts[1:]:
            combined = combined.unionByName(p)
        (combined.repartition(_F.col("_kind"), _F.col(self.BUCKET_COL))
         .write.mode("error").partitionBy("_kind", self.BUCKET_COL)
         .parquet(out_path))
        written = [data_dir]

        # Idempotent epoch re-run: when this commit registers deltas, drop
        # delta dirs a previous (crashed-after-publish) attempt of THIS
        # epoch registered, so re-appending the same inserts never
        # duplicates rows (epoch_dirs analogue of commit(mode='append')).
        # Rewrite-only commits (e.g. a journal compaction later in the same
        # epoch) leave prior delta pointers alone.
        epoch_key = str(epoch)
        stale = (set(m.get("epoch_deltas", {}).get(epoch_key, []))
                 if append is not None else set())
        if stale:
            buckets = {b: [d for d in dirs if d not in stale]
                       for b, dirs in buckets.items()}
        new_deltas = []

        dir_bytes = m.setdefault("dir_bytes", {})
        for kind, replace in (("base", True), ("delta", False)):
            kind_dir = os.path.join(out_path, f"_kind={kind}")
            if not os.path.isdir(kind_dir):
                continue
            for entry in sorted(os.listdir(kind_dir)):
                if not entry.startswith(f"{self.BUCKET_COL}="):
                    continue
                rel = os.path.join(data_dir, f"_kind={kind}", entry)
                bucket_id = entry.split("=", 1)[1]
                if replace:
                    buckets[bucket_id] = [rel]
                else:
                    buckets.setdefault(bucket_id, []).append(rel)
                    new_deltas.append(rel)
                # Iceberg-manifest analogue: capture file stats at commit
                # time so size-aware policies (small-table compaction,
                # broadcast guards) never list the store afterwards.
                entry_path = os.path.join(kind_dir, entry)
                dir_bytes[rel] = sum(
                    os.path.getsize(os.path.join(entry_path, f))
                    for f in os.listdir(entry_path)
                    if not f.startswith(("_", ".")))
        if append is not None:
            m["epoch_deltas"] = {epoch_key: new_deltas}

        snapshot = {
            "id": f"snap-{epoch:06d}-{seq:04d}",
            "epoch": epoch,
            "mode": "bucketed",
            "parent": m["snapshots"][-1]["id"] if m["snapshots"] else None,
            "committed_at": time.time(),
            "dirs": written,
            "buckets": buckets,
            "meta": meta or {},
        }
        m["snapshots"].append(snapshot)
        m["buckets"] = buckets
        m["current_dirs"] = sorted({d for dirs in buckets.values()
                                    for d in dirs})
        live = set(m["current_dirs"])
        m["dir_bytes"] = {d: b for d, b in dir_bytes.items() if d in live}
        self._publish(name, m)
        return snapshot

    def expire_snapshots(self, name: str, keep_last: int = 10) -> int:
        """Delete data dirs not referenced by the last ``keep_last``
        snapshots nor by the current state. Returns dirs removed."""
        m = self.manifest(name)
        if m is None:
            return 0
        # Bucketed tables reference sub-paths like 'snap-...-base/_bucket=3';
        # liveness is tracked at the top-level snap dir.
        live = {d.split("/")[0] for d in m["current_dirs"]}
        for dirs in m.get("buckets", {}).values():
            live.update(d.split("/")[0] for d in dirs)
        for snap in m["snapshots"][-keep_last:]:
            live.update(d.split("/")[0] for d in snap["dirs"])
            for dirs in snap.get("buckets", {}).values():
                live.update(d.split("/")[0] for d in dirs)
        removed = 0
        tdir = self._table_dir(name)
        for entry in os.listdir(tdir):
            if entry.startswith("snap-") and entry not in live:
                shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)
                removed += 1
        m["snapshots"] = m["snapshots"][-keep_last:]
        self._publish(name, m)
        return removed


def try_iceberg(spark: SparkSession) -> bool:
    """True when a real Iceberg catalog is usable in this session. The
    image has no Iceberg runtime jar, no pyiceberg wheel, and no network to
    fetch either (attempt recorded in BENCH/ICEBERG.md, with the
    call-by-call mapping from this Warehouse onto a real catalog); kept as
    the integration point for cluster deployments."""
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: SLF001
        return True
    except Exception:
        return False
