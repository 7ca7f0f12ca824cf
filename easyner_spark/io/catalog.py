"""Iceberg-style checkpointing catalog (partitioned parquet + atomic
per-partition commit manifests).

Reference analog: EasyNER's unit of checkpointing is the batch FILE —
a re-run skips/overwrites whole files and `append_to_json_file` merges
idempotently (scripts/util.py:12-23, SURVEY.md §2.1 S7). The target
contract requires: every stage checkpoints so a killed job resumes
from the last committed partition, with per-partition lineage and
counter metrics.

Real Apache Iceberg needs its runtime jar on the classpath (not in
this image — the catalog is import-try gated via ``use_iceberg``);
this class reproduces the two Iceberg properties the pipeline relies
on with plain parquet:

* ATOMIC per-partition commits: data for each ``batch_id`` partition
  is written via dynamic partition overwrite, then the manifest is
  swapped with os.replace (atomic on POSIX) — a crash between the two
  leaves re-doable partitions, never half-visible ones;
* SNAPSHOT lineage: each commit appends a snapshot entry recording the
  batches committed and their counter metrics (row count + order-
  insensitive content hash), so `history()` is an audit log and
  `counters()` is the per-partition metrics table (A6 analog,
  scripts/pubmed_bulk.py:59-87).

Resume semantics: ``write_stage`` computes only the NOT-yet-committed
partitions (partition-pruned anti-filter on batch_id, which Catalyst
pushes into the source scan) — re-running a finished stage is a no-op.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class CheckpointCatalog:
    def __init__(self, root: str, use_iceberg: bool = False):
        self.root = root
        os.makedirs(root, exist_ok=True)
        if use_iceberg:
            raise NotImplementedError(
                "Apache Iceberg runtime jar is not on the classpath in this "
                "image; on a real cluster pass spark.jars.packages="
                "org.apache.iceberg:iceberg-spark-runtime-... and swap this "
                "class for the iceberg catalog"
            )

    # ------------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}._manifest.json")

    def _load_manifest(self, stage: str) -> dict:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return {"stage": stage, "snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _store_manifest(self, stage: str, manifest: dict) -> None:
        p = self._manifest_path(stage)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, p)  # atomic snapshot swap

    # ------------------------------------------------------------------
    def committed_batches(self, stage: str) -> set[int]:
        man = self._load_manifest(stage)
        out: set[int] = set()
        for snap in man["snapshots"]:
            for b, c in snap["counters"].items():
                if c.get("retracted"):
                    out.discard(int(b))
                else:
                    out.add(int(b))
        return out

    def _retract_batches(
        self, stage: str, batches: list[int], partition_col: str
    ) -> None:
        """Physically drop vanished partitions + tombstone them in a new
        snapshot. Idempotent under crashes: dirs are removed before the
        manifest swap, and a re-run re-derives the same vanished set
        from the still-positive committed counters."""
        import shutil

        for b in batches:
            shutil.rmtree(
                os.path.join(self._stage_dir(stage), f"{partition_col}={b}"),
                ignore_errors=True,
            )
        man = self._load_manifest(stage)
        man["snapshots"].append(
            {
                "snapshot_id": len(man["snapshots"]),
                "ts": time.time(),
                "counters": {
                    str(b): {"rows": 0, "retracted": True} for b in batches
                },
            }
        )
        self._store_manifest(stage, man)

    def write_stage(
        self,
        df: DataFrame,
        stage: str,
        partition_col: str = "batch_id",
        resume_mode: str = "verify_counts",
        allow_empty: bool = False,
    ) -> dict:
        """Commit all pending partitions of ``df``; returns the snapshot
        entry ({} if everything was already committed).

        ``allow_empty``: by default a fully-empty incoming frame is
        treated as a caller bug and ignored (the stage keeps serving
        its committed rows; the return dict carries
        ``{"stale_empty_input": True}`` so the caller can tell). For
        stages whose row set can legitimately shrink to zero on re-run
        (e.g. a minted-entity dimension once every surface resolves),
        pass ``allow_empty=True`` — an empty frame then retracts every
        committed batch, and ``read_stage`` serves zero rows.

        Resume modes — "partition committed" is not "partition
        complete" when the INPUT can grow (batch_id is a hash of the
        key, so new rows land in already-committed batches):

        * ``verify_counts`` (default): one counting pass over the
          incoming frame computing row count AND the order-insensitive
          content hash; a batch is pending iff either differs from the
          committed counters (changed batches are re-committed via
          dynamic partition overwrite) — an in-place row change with an
          unchanged count (e.g. latest-crawl-wins replacing a page's
          text) is therefore re-committed, not silently kept stale.
          Re-running an unchanged stage is still a no-op.
        * ``skip_committed``: the cheap immutable-input path — skip any
          batch ever committed without looking at the data (exactly the
          reference's skip-existing-file semantics).
        """
        done = self.committed_batches(stage)
        # stamp the frame schema for any stage that has a manifest:
        # read_stage needs it to serve a typed EMPTY frame after a full
        # retraction, including manifests written before schema stamping
        # existed and runs that retract without writing new data
        if done:
            man = self._load_manifest(stage)
            if "schema" not in man:
                man["schema"] = df.schema.json()
                self._store_manifest(stage, man)
        pending = df
        if done and resume_mode == "skip_committed":
            # partition-pruned resume filter (pushed into the scan)
            pending = df.filter(~F.col(partition_col).isin(*sorted(done)))
        elif done:
            committed = self.counters(stage)
            incoming = {
                int(r[partition_col]): (r["n"], r["h"], str(r["s"]))
                for r in df.groupBy(partition_col)
                .agg(
                    F.count("*").alias("n"),
                    F.expr("bit_xor(xxhash64(*))").alias("h"),
                    F.expr("sum(cast(xxhash64(*) as decimal(38,0)))").alias("s"),
                )
                .collect()
            }

            def _same(b: int, n: int, h, s: str) -> bool:
                c = committed.get(b)
                if c is None or c["rows"] != n:
                    return False
                # BOTH folds must match (xor alone cancels even
                # multisets: {A,A}→{B,B} keeps count AND xor); missing
                # keys = pre-hash manifests → count-only fallback
                if "content_hash" in c and c["content_hash"] != h:
                    return False
                return "content_sum" not in c or c["content_sum"] == s

            changed = sorted(
                b for b, (n, h, s) in incoming.items() if not _same(b, n, h, s)
            )
            # retract committed batches absent from the incoming frame
            # (input shrank): delete their partition dirs and tombstone
            # them, else read_stage serves deleted rows forever. A
            # fully-empty incoming frame only wipes the stage under the
            # explicit allow_empty opt-in; otherwise it is treated as a
            # caller bug (no-op, flagged in the returned snapshot).
            vanished = sorted(
                b
                for b, c in committed.items()
                if (incoming or allow_empty)
                and b not in incoming
                and c.get("rows", 0) > 0
                and not c.get("retracted")
            )
            if vanished:
                self._retract_batches(stage, vanished, partition_col)
            if not incoming and not allow_empty and any(
                c.get("rows", 0) > 0 and not c.get("retracted")
                for c in committed.values()
            ):
                return {"stale_empty_input": True}
            if not changed:
                return {"retracted": vanished} if vanished else {}
            pending = df.filter(F.col(partition_col).isin(changed))

        # counters BEFORE the write (same plan feeds both via cache).
        # xxhash64(*) hashes NULLs distinctly per column (no concat_ws
        # null-blindness); keeping BOTH a bit_xor and a decimal sum of
        # the row hashes means a silent divergence needs an engineered
        # collision in two independent folds.
        pending = pending.persist()
        counters = {
            int(r[partition_col]): {
                "rows": r["rows"],
                "content_hash": r["content_hash"],
                "content_sum": str(r["content_sum"]),
            }
            for r in pending.groupBy(partition_col)
            .agg(
                F.count("*").alias("rows"),
                F.expr("bit_xor(xxhash64(*))").alias("content_hash"),
                F.expr("sum(cast(xxhash64(*) as decimal(38,0)))").alias(
                    "content_sum"
                ),
            )
            .collect()
        }
        if not counters:
            pending.unpersist()
            return {}

        (
            pending.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(self._stage_dir(stage))
        )
        pending.unpersist()

        man = self._load_manifest(stage)
        snap = {
            "snapshot_id": len(man["snapshots"]),
            "ts": time.time(),
            "counters": {str(k): v for k, v in counters.items()},
        }
        man["snapshots"].append(snap)
        # recorded so read_stage can serve a typed EMPTY frame after a
        # full retraction (no data files left to infer a schema from)
        man["schema"] = pending.schema.json()
        self._store_manifest(stage, man)
        return snap

    def read_stage(self, spark: SparkSession, stage: str) -> DataFrame:
        done = self.committed_batches(stage)
        if not done:
            man = self._load_manifest(stage)
            schema_json = man.get("schema")
            if schema_json is not None:
                from pyspark.sql.types import StructType

                return spark.createDataFrame(
                    [], StructType.fromJson(json.loads(schema_json))
                )
            if man["snapshots"]:
                # fully-retracted pre-schema-stamp manifest: no data
                # files and no recorded schema — a clear error beats an
                # UNABLE_TO_INFER_SCHEMA from the raw parquet read
                raise ValueError(
                    f"stage '{stage}' is fully retracted and its manifest "
                    "predates schema stamping; re-commit the stage (any "
                    "write_stage call stamps the schema)"
                )
            raise ValueError(f"stage '{stage}' was never committed")
        df = spark.read.parquet(self._stage_dir(stage))
        # only committed partitions are visible (a crashed write's orphan
        # partition directories are filtered out = snapshot isolation)
        return df.filter(F.col("batch_id").isin(*sorted(done))) if done else df

    def compact_stage(
        self,
        spark: SparkSession,
        stage: str,
        partition_expr,
        partition_col: str = "batch_id",
    ) -> dict:
        """Rewrite a stage into a fresh compact partition keyspace and
        reset its manifest to ONE snapshot — the Iceberg
        rewrite_data_files/expire_snapshots analog.

        Append-style stages whose writers mint new partition ranges per
        commit (e.g. the epoch-scoped signature stage) grow their
        committed-batch set and manifest without bound: after E epochs
        every reader carries an E×n_batches-literal isin() filter and
        every commit re-parses E snapshots. Compacting every K epochs
        bounds both at K×n_batches — amortized O(corpus/K) per epoch.

        ``partition_expr`` is a Column producing the NEW partition id
        for each row (e.g. ``pmod(xxhash64("doc_id"), lit(64))``).
        Crash safety: the compacted data is fully written to a sibling
        ``<stage>.compacting`` directory before anything existing is
        touched, so a crash during the (long) rewrite leaves the
        original stage untouched and served. The final swap is two
        directory renames + the manifest reset; a crash in that narrow
        window leaves the previous data preserved in ``<stage>.old``
        (recovery: rename it back) — the same non-atomic-rename caveat
        a real object store has, where Iceberg's metadata pointer swap
        is the fix (README's Iceberg note).
        """
        import shutil

        df = self.read_stage(spark, stage).drop(partition_col)
        compacted = df.withColumn(
            partition_col, partition_expr.cast("int")
        ).persist()
        counters = {
            int(r[partition_col]): {
                "rows": r["rows"],
                "content_hash": r["content_hash"],
                "content_sum": str(r["content_sum"]),
            }
            for r in compacted.groupBy(partition_col)
            .agg(
                F.count("*").alias("rows"),
                F.expr("bit_xor(xxhash64(*))").alias("content_hash"),
                F.expr("sum(cast(xxhash64(*) as decimal(38,0)))").alias(
                    "content_sum"
                ),
            )
            .collect()
        }
        tmp_dir = self._stage_dir(stage) + ".compacting"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        (
            compacted.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(tmp_dir)
        )
        schema_json = compacted.schema.json()
        compacted.unpersist()
        old_dir = self._stage_dir(stage) + ".old"
        shutil.rmtree(old_dir, ignore_errors=True)
        os.replace(self._stage_dir(stage), old_dir)
        os.replace(tmp_dir, self._stage_dir(stage))
        snap = {
            "snapshot_id": 0,
            "ts": time.time(),
            "compacted": True,
            "counters": {str(k): v for k, v in counters.items()},
        }
        self._store_manifest(
            stage, {"stage": stage, "snapshots": [snap], "schema": schema_json}
        )
        shutil.rmtree(old_dir, ignore_errors=True)
        return snap

    def counters(self, stage: str) -> dict[int, dict]:
        out: dict[int, dict] = {}
        for snap in self._load_manifest(stage)["snapshots"]:
            for b, c in snap["counters"].items():
                out[int(b)] = c
        return out

    def history(self, stage: str) -> list[dict]:
        return self._load_manifest(stage)["snapshots"]
