"""Phase checkpointing + per-partition lineage/metrics (north_rule S5 analog).

Production target is Iceberg: each pipeline phase commits a snapshot and a
restart resumes from the last committed snapshot. Iceberg jars are not in
this image (import-gated below), so the same contract is implemented over
parquet directories with an atomic _SUCCESS marker: a phase whose output
exists and is marked complete is read back instead of recomputed -- identical
resume semantics, swap `format("parquet")` for `format("iceberg")` +
`rewrite_data_files` compaction in production (the reference's commit +
forceMerge(1), DwcaNameIndexer.java:131-186,614-626 -- S3 in SURVEY.md §2.1).

The metrics table mirrors the reference's metadata.json/idmap.txt lineage
outputs (DwcaNameIndexer.writeMetadata/writeIdMap, DwcaNameIndexer.java:
1052-1130): one row per (phase, partition) with row counts and timings.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not present in this image
    import pyiceberg  # noqa: F401
    HAS_ICEBERG = True
except Exception:  # pragma: no cover
    HAS_ICEBERG = False


class CheckpointManager:
    """Resumable phase-output store rooted at a working directory."""

    def __init__(self, spark: SparkSession, root: str, enabled: bool = True):
        self.spark = spark
        self.root = root
        self.enabled = enabled
        self._metrics: list[dict] = []
        if enabled:
            os.makedirs(root, exist_ok=True)

    def _path(self, phase: str) -> str:
        return os.path.join(self.root, phase)

    def exists(self, phase: str) -> bool:
        return self.enabled and os.path.exists(
            os.path.join(self._path(phase), "_SUCCESS")
        )

    def read(self, phase: str) -> DataFrame:
        return self.spark.read.parquet(self._path(phase))

    def materialize(self, phase: str, df: DataFrame, partition_by: list[str] | None = None) -> DataFrame:
        """Write the phase output (snapshot commit analog) and read it back.

        Reading back truncates lineage -- the checkpoint doubles as the
        iterative-job lineage cut. When checkpointing is disabled the
        DataFrame passes through (pure in-memory pipeline for small tests).
        """
        if not self.enabled:
            return df
        if self.exists(phase):
            return self.read(phase)
        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(phase))
        if os.environ.get("ALA_SPARK_PHASE_TIMING", "") == "1":
            print(f"[ckpt] {phase} write {time.time() - t0:6.2f}s", flush=True)
        out = self.read(phase)
        # Per-partition lineage rows (S5): one output file per write task, so
        # parquet footers carry the per-partition row counts -- metadata-only,
        # no rescan of the phase output. (Production Iceberg: the same counts
        # come from the snapshot manifest's per-file stats.) A full
        # groupBy(spark_partition_id).count() here re-read every phase's
        # entire output and was a measurable per-phase tax at bench scale.
        wall = round(time.time() - t0, 3)
        for pid, rows in enumerate(self._footer_counts(phase)):
            self._metrics.append(
                {"phase": phase, "partition": pid, "rows": rows, "wall_sec": wall}
            )
        return out

    def row_count(self, phase: str) -> int | None:
        """Exact row count of a committed phase from parquet footers only.

        Metadata-only (no Spark job): the production analog is reading the
        Iceberg snapshot manifest's record counts. Returns None when the
        phase has not been committed, so callers fall back to a count().
        Driver actions like this are a fixed, non-scaling cost in the
        two-cluster-size criterion -- footers keep them off the job queue.
        """
        if not self.exists(phase):
            return None
        return sum(self._footer_counts(phase))

    def _footer_counts(self, phase: str) -> list[int]:
        import glob
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(self._path(phase), "part-*")))
        if not files:
            return []
        # footer reads release the GIL in pyarrow; a phase can have hundreds
        # of part files and this runs on the driver between jobs (a fixed,
        # non-scaling cost in the two-cluster-size criterion), so parallelize
        with ThreadPoolExecutor(min(16, len(files))) as ex:
            return list(ex.map(lambda f: pq.read_metadata(f).num_rows, files))

    def _local_files(self, phase: str) -> list[str] | None:
        import glob

        if not self.exists(phase) or "://" in self.root:
            return None
        return sorted(glob.glob(os.path.join(self._path(phase), "part-*")))

    def read_local_pandas(self, phase: str, columns: list[str] | None = None):
        """Driver-side pyarrow read of a committed phase on LOCAL storage.

        Returns a pandas frame, or None when the phase is uncommitted or the
        root is an object store (production falls back to a Spark collect).
        For small driver-side tables (edge lists, label maps) this replaces a
        full Spark job -- collect scheduling was a measurable fixed cost in
        the two-cluster-size criterion. The Iceberg analog is a direct
        manifest-guided pyarrow read of the snapshot's data files.
        """
        files = self._local_files(phase)
        if files is None:
            return None
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = self.read_local_arrow(phase, columns)
        return tbl.to_pandas() if tbl is not None else None

    def read_local_arrow(self, phase: str, columns: list[str] | None = None):
        """Like read_local_pandas but stays in Arrow (no python objects)."""
        files = self._local_files(phase)
        if files is None:
            return None
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow as pa
        import pyarrow.parquet as pq

        with ThreadPoolExecutor(min(16, max(1, len(files)))) as ex:
            parts = list(ex.map(lambda f: pq.read_table(f, columns=columns), files))
        return pa.concat_tables(parts)

    def write_driver_table(self, name: str, pdf, n_files: int = 8) -> str | None:
        """Persist a driver-side pandas frame as a readable parquet phase.

        Chunked into `n_files` so a Spark scan of it parallelizes. Returns
        the path (None when checkpointing is off or the root is remote --
        callers fall back to spark.createDataFrame). This is the fast lane
        for shipping driver-computed tables (cluster labels) back into the
        distributed plan: pyarrow write + parquet scan measured well under
        half the cost of createDataFrame's arrow conversion at millions of
        rows.
        """
        if not self.enabled or "://" in self.root:
            return None
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        t0 = time.time()
        path = self._path(name)
        shutil.rmtree(path, ignore_errors=True)  # no stale parts on rewrite
        os.makedirs(path, exist_ok=True)
        tbl = (
            pdf
            if isinstance(pdf, pa.Table)
            else pa.Table.from_pandas(pdf, preserve_index=False)
        )
        n = max(1, min(n_files, len(tbl)))
        step = (len(tbl) + n - 1) // n if len(tbl) else 1
        chunk_rows = []
        for i in range(n):
            chunk = tbl.slice(i * step, step)
            pq.write_table(chunk, os.path.join(path, f"part-{i:05d}.parquet"))
            chunk_rows.append(len(chunk))
        with open(os.path.join(path, "_SUCCESS"), "w"):
            pass
        # same per-partition lineage contract (S5) as materialize() -- the
        # all-driver lane must not leave holes in _metrics.json depending on
        # which codepath wrote the phase
        wall = round(time.time() - t0, 3)
        for pid, rows in enumerate(chunk_rows):
            self._metrics.append(
                {"phase": name, "partition": pid, "rows": rows, "wall_sec": wall}
            )
        return path

    def write_metrics(self) -> str | None:
        """Persist the lineage/metrics rows next to the phase tables."""
        if not self.enabled:
            return None
        path = os.path.join(self.root, "_metrics.json")
        existing: list[dict] = []
        if os.path.exists(path):
            with open(path) as fh:
                existing = json.load(fh)
        # a resumed run re-reads phases without re-materializing them; keep
        # the original lineage rows and append only genuinely new phases
        seen = {m["phase"] for m in self._metrics}
        merged = [m for m in existing if m["phase"] not in seen] + self._metrics
        with open(path, "w") as fh:
            json.dump(merged, fh, indent=1)
        return path
