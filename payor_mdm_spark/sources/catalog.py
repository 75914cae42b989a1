"""Stage checkpoint store: every pipeline stage ends in a table write.

Production design point is Iceberg: each stage materializes with
``writeTo(...).createOrReplace()`` so a run is resumable from the last
committed snapshot (the Spark analog of the reference's per-model dbt
materializations, dbt_project.yml:17-26 — and the north_rule's "resumable
from Iceberg snapshot checkpoints"). The sandbox has no Iceberg runtime jar,
so the store also speaks a plain-parquet dialect with identical semantics:
atomic directory replace + Spark's _SUCCESS marker as the commit record.

Resume contract: ``exists(stage)`` is true only for a *committed* write;
``run_pipeline(..., resume=True)`` skips completed stages and re-reads their
output (tests/test_pipeline.py::test_resume_skips_completed_stages).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str, mode: str = "parquet",
                 iceberg_namespace: str | None = None):
        self.spark = spark
        self.root = root
        self.mode = mode
        self.iceberg_namespace = iceberg_namespace
        if mode == "parquet":
            os.makedirs(root, exist_ok=True)

    # -- parquet dialect ---------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        if self.mode == "iceberg":
            return self.spark.catalog.tableExists(self._table(name))
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def _table(self, name: str) -> str:
        return f"{self.iceberg_namespace}.{name}" if self.iceberg_namespace else name

    def write(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        bucket_by: tuple[int, list[str]] | None = None,
    ) -> None:
        """Commit a stage table. ``bucket_by=(n, cols)`` is the 10^12-row
        layout knob: on Iceberg it becomes a bucket(n, col) partition
        transform (co-located equi-joins on conv_id without a shuffle, and
        manifest-level pruning); the parquet dialect approximates it with a
        hash repartition into n files so downstream same-key joins read
        co-located files."""
        if self.mode == "iceberg":
            from pyspark.sql.functions import partitioning

            writer = df.writeTo(self._table(name))
            parts = []
            if bucket_by:
                n, cols = bucket_by
                parts.extend(partitioning.bucket(n, df[c]) for c in cols)
            if partition_by:
                parts.extend(df[c] for c in partition_by)
            if parts:
                writer = writer.partitionedBy(*parts)
            writer.createOrReplace()
            return
        # atomic-replace parquet: write to tmp, swap
        if bucket_by:
            n, cols = bucket_by
            df = df.repartition(n, *cols)
        final = self._path(name)
        tmp = final + f".tmp-{int(time.time() * 1e6)}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        # the swap happens behind Spark's back — drop any cached file
        # listing for the destination path, or a later read in this session
        # resolves to the replaced files (FAILED_READ_FILE.FILE_NOT_EXIST)
        self.spark.catalog.refreshByPath(final)

    def append(self, name: str, df: DataFrame) -> None:
        """Append-only landing write (streaming micro-batches): Iceberg
        ``append()`` snapshot, parquet append-mode files. O(batch), never
        a rewrite of the table."""
        if self.mode == "iceberg":
            if not self.exists(name):
                df.writeTo(self._table(name)).createOrReplace()
            else:
                df.writeTo(self._table(name)).append()
            return
        final = self._path(name)
        df.write.mode("append").parquet(final)
        self.spark.catalog.refreshByPath(final)

    def read(self, name: str) -> DataFrame:
        if self.mode == "iceberg":
            return self.spark.read.table(self._table(name))
        return self.spark.read.parquet(self._path(name))

    def commit_stats(self, name: str) -> list[tuple[int, int]]:
        """Per-file row counts of a committed stage WITHOUT re-scanning data.

        The per-partition lineage source (north_rule) — replaces the round-1
        ``groupBy(spark_partition_id()).count()`` re-scan (VERDICT r01 item
        3). Parquet dialect: footer metadata only (pyarrow reads ~8 bytes +
        the footer per file; no Spark job, no data pages). Iceberg dialect:
        the ``.files`` metadata table's ``record_count`` column — manifest
        stats, no data scan. Returns [(partition_id, rows)] ordered by file.
        """
        if self.mode == "iceberg":
            files = (
                self.spark.read.table(f"{self._table(name)}.files")
                .select("record_count")
                .collect()
            )
            return [(i, int(r["record_count"])) for i, r in enumerate(files)]
        import pyarrow.parquet as pq

        root = self._path(name)
        stats: list[tuple[int, int]] = []
        part_files = []
        for dirpath, _dirnames, filenames in os.walk(root):
            for f in filenames:
                if f.endswith(".parquet"):
                    part_files.append(os.path.join(dirpath, f))
        for i, path in enumerate(sorted(part_files)):
            stats.append((i, pq.ParquetFile(path).metadata.num_rows))
        return stats

    def drop(self, name: str) -> None:
        if self.mode == "iceberg":
            self.spark.sql(f"DROP TABLE IF EXISTS {self._table(name)}")
            return
        p = self._path(name)
        if os.path.exists(p):
            shutil.rmtree(p)
