"""Parquet-backed warehouse: the engine's table store.

Replaces the reference's SQLite data DB (/root/reference/core/
database.py) with partition-friendly parquet directories, one per
table, registered as temp views for Spark SQL. Writes are atomic at
the directory level (write to ``<table>.tmp-<nonce>``, swap) so a
failed job never corrupts the live table — the closest plain-parquet
analog of the reference's transactional upsert.

At 100 TB the same layout holds: fact tables gain a partition column
(e.g. month of the primary timestamp) via ``partition_by``; the
overwrite-merge upsert becomes a partition-scoped rewrite rather than
a whole-table one when keys are time-clustered (or a Delta/Iceberg
MERGE where a lakehouse format is available).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from calaveras_uniteus_etl_spark.schema import TABLE_SCHEMAS


class Warehouse:
    def __init__(self, spark: SparkSession, root: str, snapshot_retention: int = 0):
        """``snapshot_retention`` > 0 turns every overwrite's displaced
        directory into a retained table version (time travel): the
        atomic swap already produces the old directory for free, so
        keeping the last N versions costs one rename instead of a
        delete — the plain-parquet sketch of a lakehouse table's
        version history. 0 (default) preserves the original
        delete-on-swap behavior."""
        self.spark = spark
        self.root = root
        self.snapshot_retention = snapshot_retention
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    # column renames shipped after warehouses existed: old name -> new.
    # read() aliases on the fly so pre-rename tables keep working; the
    # next overwrite persists the new name.
    _LEGACY_RENAMES = {
        "assistance_requests": {"housing_status": "housing_current_status"},
    }

    def read(self, table: str) -> DataFrame:
        if self.exists(table):
            df = self.spark.read.parquet(self.path(table))
            for old, new in self._LEGACY_RENAMES.get(table, {}).items():
                if old in df.columns and new not in df.columns:
                    df = df.withColumnRenamed(old, new)
            return df
        if table in TABLE_SCHEMAS:
            return self.spark.createDataFrame([], TABLE_SCHEMAS[table])
        raise FileNotFoundError(f"table {table!r} not found in warehouse")

    def write(
        self,
        table: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        """Write with atomic swap for overwrites.

        Overwriting a table whose own scan feeds the new plan (the
        merge-upsert shape) would otherwise read-while-truncate; the
        tmp-dir swap also removes that hazard.
        """
        target = self.path(table)
        if mode == "append" and self.exists(table):
            writer = df.write.mode("append")
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(target)
            return
        tmp = f"{target}.tmp-{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        old = f"{target}.old-{uuid.uuid4().hex[:8]}"
        if os.path.exists(target):
            os.rename(target, old)
        os.rename(tmp, target)
        if os.path.exists(old):
            if self.snapshot_retention > 0:
                os.makedirs(self._snap_root(table), exist_ok=True)
                seq = (max(self.list_snapshots(table), default=-1)) + 1
                os.rename(old, self._snap_path(table, seq))
                self._prune_snapshots(table)
            else:
                shutil.rmtree(old, ignore_errors=True)

    # ------------------------------------------------------------------
    # Table versions (time travel). Versions are integers in write
    # order; version v is the table state displaced by the (v+1)-th
    # retained overwrite. Monotonic across pruning: sequence numbers
    # are never reused, so "version 7" always means the same bytes.
    # ------------------------------------------------------------------

    def _snap_root(self, table: str) -> str:
        return os.path.join(self.root, "_snapshots", table)

    def _snap_path(self, table: str, seq: int) -> str:
        return os.path.join(self._snap_root(table), f"v{seq:08d}")

    def list_snapshots(self, table: str) -> list[int]:
        """Retained version numbers, oldest first."""
        root = self._snap_root(table)
        if not os.path.isdir(root):
            return []
        return sorted(
            int(d[1:]) for d in os.listdir(root)
            if d.startswith("v") and d[1:].isdigit()
        )

    def _prune_snapshots(self, table: str) -> None:
        snaps = self.list_snapshots(table)
        for seq in snaps[: max(0, len(snaps) - self.snapshot_retention)]:
            shutil.rmtree(self._snap_path(table, seq), ignore_errors=True)

    def read_version(self, table: str, version: int) -> DataFrame:
        """Read a retained historical version of a table."""
        p = self._snap_path(table, version)
        if not os.path.isdir(p):
            raise FileNotFoundError(
                f"table {table!r} has no retained version {version}; "
                f"available: {self.list_snapshots(table)}"
            )
        return self.spark.read.parquet(p)

    def restore(self, table: str, version: int) -> None:
        """Make a historical version current (the pre-restore state is
        itself retained as a new version, so a restore is undoable)."""
        self.write(table, self.read_version(table, version))

    def register_views(self, tables: list[str] | None = None) -> None:
        """Expose warehouse tables as temp views for spark.sql."""
        for t in tables or [t for t in TABLE_SCHEMAS if self.exists(t)]:
            self.read(t).createOrReplaceTempView(t)

    def table_stats(self) -> dict[str, int]:
        """COUNT(*) per existing table (reference core/database.py:723-769)."""
        return {t: self.read(t).count() for t in TABLE_SCHEMAS if self.exists(t)}

    def compact(
        self,
        table: str,
        target_file_bytes: int = 128 << 20,
        partition_by: list[str] | None = None,
    ) -> dict[str, int]:
        """OPTIMIZE-style small-file compaction (bin packing).

        Incremental appends accumulate small files; at scale a table of
        million-row parquet shards degrades every scan (task-per-file
        scheduling, no row-group locality). This is a FULL rewrite of
        the table into ``ceil(bytes / target)`` files via the
        atomic-swap write path; ``partition_by`` re-establishes the
        directory layout (rows cluster per partition, so a skewed
        partition can exceed the target — the bin-pack target is
        table-global, not per-partition). A lakehouse format's
        partition-scoped OPTIMIZE is the upgrade path when only a few
        partitions are fragmented. Returns before/after file counts.
        """
        import math

        p = self.path(table)
        files_before = sum(
            1
            for root, _, names in os.walk(p)
            for f in names
            if f.endswith(".parquet")
        )
        size = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, names in os.walk(p)
            for f in names
            if f.endswith(".parquet")
        )
        n = max(1, math.ceil(size / target_file_bytes))
        df = self.read(table)
        cols = partition_by or []
        compacted = df.repartition(n, *cols) if cols else df.repartition(n)
        self.write(table, compacted, partition_by=partition_by)
        files_after = sum(
            1
            for root, _, names in os.walk(self.path(table))
            for f in names
            if f.endswith(".parquet")
        )
        return {"files_before": files_before, "files_after": files_after, "bytes": size}

    def write_bucketed(
        self,
        table: str,
        df: DataFrame,
        bucket_cols: list[str],
        n_buckets: int = 32,
        sort_cols: list[str] | None = None,
    ) -> None:
        """Persist as a bucketed catalog table (co-located join path).

        Two tables bucketed the same way on their join key sort-merge
        join WITHOUT either side shuffling — at 100 TB that removes the
        dominant cost of every fact-to-fact join on a stable key. Plain
        ``df.write.parquet`` cannot carry bucket metadata, so this path
        goes through ``saveAsTable`` (session catalog); the bucket
        spec's hash is Spark-internal, which is fine here — bucketing
        is a physical layout contract between Spark jobs, not a
        cross-engine semantic.
        """
        writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.option("path", self.path(f"bucketed_{table}")).saveAsTable(table)

    def write_sorted(
        self,
        table: str,
        df: DataFrame,
        range_cols: list[str],
        n_files: int | None = None,
    ) -> None:
        """Range-clustered rewrite for row-group min/max pruning.

        ``repartitionByRange`` gives every output file a disjoint slice
        of the sort key and ``sortWithinPartitions`` orders rows inside
        each file, so parquet footer min/max statistics become
        selective: a point or range predicate on the key skips whole
        files and row groups at planning/scan time. This is the
        single-column complement to the Morton layout m3 computes —
        use it for the one dominant filter column (usually event time);
        use z-order when two columns share the scans. The write goes
        through the atomic-swap path like every overwrite.
        """
        n = n_files or df.sparkSession.sparkContext.defaultParallelism
        clustered = df.repartitionByRange(n, *range_cols).sortWithinPartitions(
            *range_cols
        )
        self.write(table, clustered)
