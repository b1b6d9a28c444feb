"""Snapshot checkpoints + per-partition lineage manifests + anti-join resume.

Iceberg-style semantics on a plain-Parquet layout (SURVEY.md §7.4 risk 4: the
iceberg-spark runtime jar is not in this sandbox, so the table format is
emulated with an identical API — swapping the IO layer for
``df.writeTo(tbl).append()`` + snapshot metadata is a drop-in).

Layout under ``base_path``:

    data/snapshot_id=N/*.parquet       -- the rows of snapshot N
    manifest/snapshot_id=N/*.parquet   -- per-partition lineage rows

A snapshot is **committed** iff its manifest directory exists — the manifest
is always written *after* the data (write-ordering commit protocol, the
generalization of the reference's flush-every-10-pairs checkpointing,
`05_dtw_alignment_experiment/dtw_alignment.py:1323-1328`).

Manifest row = (partition_id, rows, payload, checksum, watermark_ts):
- ``checksum`` is an order-independent sum of per-row xxhash64 over the key
  columns, so it is invariant to partitioning/shuffle order;
- ``watermark_ts`` is the max event time in the partition — at cluster scale
  the resume planner prunes whole snapshots by watermark before anti-joining.

Resume = anti-join the input's keys against committed keys
(:meth:`CheckpointTable.remaining`); a killed run recommits only missing keys
and the final table is byte-identical (tested in tests/test_checkpoint.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _row_checksum(key_cols: list[str]) -> Column:
    """Order-independent content checksum: SUM of per-row xxhash64, widened to
    DECIMAL(38,0) so the sum is exact and ANSI-safe (a raw BIGINT sum of 64-bit
    hashes overflows, which ANSI mode — the Spark 4 default — turns into an
    ARITHMETIC_OVERFLOW error instead of wraparound)."""
    return F.sum(F.xxhash64(*key_cols).cast("decimal(38,0)"))


class CheckpointTable:
    """Layout v2: manifest ``checksum`` is DECIMAL(38,0) (exact sum of
    per-row 60-bit hashes). v1 tables (wrapping BIGINT checksums) are not
    readable by ``verify()``/``read_manifest()`` — recompute manifests (or
    re-snapshot) when upgrading; snapshots written by different layout
    versions must not be mixed under one ``base_path``."""

    def __init__(self, base_path: str):
        self.base = base_path
        self.data_dir = os.path.join(base_path, "data")
        self.manifest_dir = os.path.join(base_path, "manifest")

    # ------------------------------------------------------------- metadata

    def _ids(self, root: str) -> list[int]:
        if not os.path.isdir(root):
            return []
        out = []
        for d in os.listdir(root):
            if d.startswith("snapshot_id="):
                out.append(int(d.split("=", 1)[1]))
        return sorted(out)

    def committed_snapshots(self) -> list[int]:
        return self._ids(self.manifest_dir)

    def next_snapshot_id(self) -> int:
        # consider uncommitted (partially written) data dirs too, so a crashed
        # write never collides with the next attempt
        seen = set(self._ids(self.manifest_dir)) | set(self._ids(self.data_dir))
        return (max(seen) + 1) if seen else 0

    def _snap_path(self, root: str, sid: int) -> str:
        return os.path.join(root, f"snapshot_id={sid}")

    # ------------------------------------------------------------- write

    def write_snapshot(
        self,
        df: DataFrame,
        key_cols: list[str],
        payload_col: str | None = None,
        watermark_col: str | None = None,
    ) -> int:
        """Append one snapshot; returns its id. Data first, manifest last."""
        spark = df.sparkSession
        sid = self.next_snapshot_id()
        data_path = self._snap_path(self.data_dir, sid)
        df.write.mode("overwrite").parquet(data_path)

        # lineage from the files as committed (re-read, not the input plan)
        written = spark.read.parquet(data_path)
        payload = (
            F.sum(F.col(payload_col).cast("long"))
            if payload_col
            else F.lit(None).cast("long")
        )
        watermark = (
            F.max(F.col(watermark_col)).cast("string")
            if watermark_col
            else F.lit(None).cast("string")
        )
        manifest = written.groupBy(
            F.spark_partition_id().alias("partition_id")
        ).agg(
            F.count(F.lit(1)).alias("rows"),
            payload.alias("payload"),
            _row_checksum(key_cols).alias("checksum"),
            watermark.alias("watermark_ts"),
        )
        manifest.coalesce(1).write.mode("overwrite").parquet(
            self._snap_path(self.manifest_dir, sid)
        )
        return sid

    def abort_uncommitted(self) -> list[int]:
        """Drop data dirs that have no manifest (crash leftovers)."""
        committed = set(self._ids(self.manifest_dir))
        dropped = []
        for sid in self._ids(self.data_dir):
            if sid not in committed:
                shutil.rmtree(self._snap_path(self.data_dir, sid))
                dropped.append(sid)
        return dropped

    # ------------------------------------------------------------- read

    def _committed_as_of(self, as_of_snapshot: int | None) -> list[int]:
        ids = self.committed_snapshots()
        if as_of_snapshot is not None:
            ids = [i for i in ids if i <= as_of_snapshot]
        if not ids:
            raise FileNotFoundError(
                f"no committed snapshots under {self.base}"
                + (f" at or before snapshot {as_of_snapshot}"
                   if as_of_snapshot is not None else "")
            )
        return ids

    def read(
        self, spark: SparkSession, as_of_snapshot: int | None = None
    ) -> DataFrame:
        """Union of committed snapshots (uncommitted data is invisible).
        ``as_of_snapshot`` is the Iceberg ``VERSION AS OF`` analog: read the
        table exactly as it stood after that snapshot committed — time travel
        is free because snapshots are append-only immutable dirs."""
        ids = self._committed_as_of(as_of_snapshot)
        paths = [self._snap_path(self.data_dir, i) for i in ids]
        return spark.read.option("basePath", self.data_dir).parquet(*paths)

    def read_manifest(
        self, spark: SparkSession, as_of_snapshot: int | None = None
    ) -> DataFrame:
        ids = self._committed_as_of(as_of_snapshot)
        paths = [self._snap_path(self.manifest_dir, i) for i in ids]
        return spark.read.option("basePath", self.manifest_dir).parquet(*paths)

    # ------------------------------------------------------------- resume

    def remaining(
        self,
        input_df: DataFrame,
        key_cols: list[str],
        input_min_ts: str | None = None,
    ) -> DataFrame:
        """Input rows whose keys are not yet in any committed snapshot.

        ``input_min_ts`` (an ISO timestamp string — ``YYYY-MM-DD HH:MM:SS``
        with optional ``T`` separator and fractional seconds; both sides
        are PARSED to datetimes before comparing, because raw string order
        breaks on separator bytes AND fractional-second width — a wm
        without ``.000000`` would sort below the same instant written with
        it and wrongly prune) enables the manifest
        watermark prune the module docstring promises: snapshots whose
        recorded max event time (manifest ``watermark_ts``) is strictly
        below the input's min event time are skipped ENTIRELY — their
        data files are never opened, so a resume that appends a new day
        anti-joins against the recent snapshots only, not the whole
        table. Valid ONLY under the append-in-event-time-order contract
        (keys of older event time were committed in older snapshots) —
        the caller asserts that contract by passing the argument; without
        it, every committed snapshot is read, which is always correct."""
        spark = input_df.sparkSession
        try:
            ids = self._committed_as_of(None)
        except FileNotFoundError:
            return input_df
        if input_min_ts is not None:
            # parse BOTH sides to datetimes: a raw string compare breaks on
            # separator ('T' vs ' ') AND on fractional-second width (a wm
            # without '.000000' sorts BELOW the same instant written with
            # it, wrongly pruning). Unparseable values fall back to keeping
            # the snapshot — pruning is an optimization, never allowed to
            # drop a relevant snapshot.
            from datetime import datetime

            def _ts(s: str):
                try:
                    return datetime.fromisoformat(s.replace("T", " "))
                except ValueError:
                    return None

            min_dt = _ts(input_min_ts)
            if min_dt is None:
                raise ValueError(
                    f"input_min_ts {input_min_ts!r} is not an ISO "
                    "timestamp (YYYY-MM-DD HH:MM:SS[.ffffff])"
                )
            m = self.read_manifest(spark)
            keep = set()
            for r in m.groupBy("snapshot_id").agg(
                F.max("watermark_ts").alias("wm")
            ).collect():
                wm = _ts(r["wm"]) if r["wm"] is not None else None
                if r["wm"] is None or wm is None or wm >= min_dt:
                    keep.add(r["snapshot_id"])
            ids = [i for i in ids if i in keep]
            if not ids:
                return input_df
        paths = [self._snap_path(self.data_dir, i) for i in ids]
        done = (
            spark.read.option("basePath", self.data_dir)
            .parquet(*paths)
            .select(*key_cols)
            .distinct()
        )
        return input_df.join(done, on=key_cols, how="left_anti")

    # ------------------------------------------------------------- upsert

    _OP = "_op"  # 'U' = upsert row, 'D' = equality-delete tombstone

    def upsert(
        self,
        df: DataFrame,
        key_cols: list[str],
        payload_col: str | None = None,
        watermark_col: str | None = None,
    ) -> int:
        """MERGE INTO, Iceberg-v2 merge-on-read style: append the delta as
        a snapshot tagged ``_op='U'``; :meth:`read_current` resolves each
        key to its newest version. Nothing is rewritten — an upsert of k
        rows costs O(k) writes whatever the table size, which is the only
        shape that works when the table is 100 TB and the delta is not.
        Contract: one row per key within a single upsert (enforced
        downstream by the latest-wins window, but two same-key rows in ONE
        snapshot have no defined order)."""
        return self.write_snapshot(
            df.withColumn(self._OP, F.lit("U")),
            key_cols,
            payload_col=payload_col,
            watermark_col=watermark_col,
        )

    def delete(self, keys_df: DataFrame, key_cols: list[str]) -> int:
        """Equality-delete: append a tombstone snapshot holding only the
        key columns (``_op='D'``). Readers drop the key from the current
        view; history before the delete is still time-travelable."""
        return self.write_snapshot(
            keys_df.select(*key_cols).withColumn(self._OP, F.lit("D")),
            key_cols,
        )

    def read_current(
        self,
        spark: SparkSession,
        key_cols: list[str],
        as_of_snapshot: int | None = None,
    ) -> DataFrame:
        """Latest-wins view: per key, the row from the highest committed
        snapshot id <= ``as_of_snapshot`` (all, when None), with tombstoned
        keys removed. Plain-append snapshots (written before any upsert,
        no ``_op`` column) read as upserts via mergeSchema + coalesce.

        One hash exchange on the keys + a map-side WindowGroupLimit (the
        Spark 4 row_number()<=1 rewrite) — no join, no second shuffle."""
        from pyspark.sql import Window

        ids = self._committed_as_of(as_of_snapshot)
        base = self.base_snapshot()
        if base is not None and base in ids:
            # the compaction snapshot holds the full state as of base:
            # everything earlier is redundant for this read (and may
            # already be expired). as_of BEFORE the base keeps all ids —
            # pre-base time travel works until expire_snapshots().
            ids = [i for i in ids if i >= base]
        paths = [self._snap_path(self.data_dir, i) for i in ids]
        data = (
            spark.read.option("basePath", self.data_dir)
            .option("mergeSchema", "true")
            .parquet(*paths)
        )
        if self._OP not in data.columns:
            data = data.withColumn(self._OP, F.lit("U"))
        data = data.withColumn(
            self._OP, F.coalesce(F.col(self._OP), F.lit("U"))
        )
        w = Window.partitionBy(*key_cols).orderBy(
            F.col("snapshot_id").desc()
        )
        return (
            data.withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1) & (F.col(self._OP) != "D"))
            .drop("_rn", self._OP)
        )

    def diff(
        self,
        spark: SparkSession,
        key_cols: list[str],
        from_snapshot: int | None,
        to_snapshot: int,
    ) -> DataFrame:
        """CDC between two committed versions: one row per changed key with
        ``change`` in ('I', 'U', 'D') — insert/update/delete of the CURRENT
        view between ``from_snapshot`` (exclusive basis; None = empty
        table) and ``to_snapshot``. Row equality is xxhash64 over all
        payload columns, so an upsert that rewrites a key with identical
        values is NOT reported. One full-outer join on the keys.
        Contract: both versions share the payload schema — a column first
        added between the two snapshots makes the older view's fingerprint
        unresolvable (diff across an additive schema change is not
        supported; diff within one schema era is)."""
        new = self.read_current(spark, key_cols, to_snapshot)
        payload_cols = [
            c for c in new.columns
            if c not in key_cols and c != "snapshot_id"
        ]
        fp = F.xxhash64(*[F.col(c) for c in payload_cols]) if payload_cols \
            else F.lit(0)
        b = new.select(*key_cols, fp.alias("_fp_b"))
        if from_snapshot is None:
            return b.select(*key_cols, F.lit("I").alias("change"))
        old = self.read_current(spark, key_cols, from_snapshot)
        a = old.select(*key_cols, fp.alias("_fp_a"))
        j = a.join(b, key_cols, "full_outer")
        return (
            j.select(
                *key_cols,
                F.when(F.col("_fp_a").isNull(), "I")
                .when(F.col("_fp_b").isNull(), "D")
                .when(F.col("_fp_a") != F.col("_fp_b"), "U")
                .alias("change"),
            )
            .where(F.col("change").isNotNull())
        )

    # --------------------------------------------------- compaction/expiry

    def _base_path(self) -> str:
        return os.path.join(self.base, "base_snapshot")

    def base_snapshot(self) -> int | None:
        """Newest committed compaction baseline, or None. Reads at or after
        the base prune every earlier snapshot; time travel BEFORE the base
        still works until :meth:`expire_snapshots` reclaims those dirs."""
        p = self._base_path()
        if not os.path.isfile(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def compact(self, spark: SparkSession, key_cols: list[str]) -> int:
        """Squash history: write the whole CURRENT view (latest-wins,
        tombstones applied) as one snapshot and mark it as the read
        baseline — the Iceberg rewrite_data_files + new-base analog, the
        answer to merge-on-read's ever-growing snapshot chain and the
        small-files problem. Readers then touch ONE snapshot's files
        instead of N; logical contents are bit-identical (tested).

        Crash-safe by ordering: the marker is written only after the
        compaction snapshot commits. A crash before the marker leaves a
        redundant (but harmless) upsert snapshot — every key resolves to
        identical values through the ordinary latest-wins window."""
        cur = self.read_current(spark, key_cols).drop("snapshot_id")
        sid = self.upsert(cur, key_cols)
        tmp = self._base_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.replace(tmp, self._base_path())
        return sid

    def table_stats(self, spark: SparkSession) -> DataFrame:
        """Maintenance report, one row per committed snapshot: data files,
        bytes, manifest-recorded rows, payload and max watermark — the
        numbers a compaction policy reads ("too many small files / too
        long a merge-on-read chain → compact()"). File counts come from a
        driver-side directory listing (metadata-only, like Iceberg's
        manifests — never a data scan); rows/payload come from the
        already-written manifests."""
        rows = []
        for sid in self.committed_snapshots():
            d = self._snap_path(self.data_dir, sid)
            files = [
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            ]
            rows.append(
                (sid, len(files), sum(os.path.getsize(f) for f in files))
            )
        listing = spark.createDataFrame(
            rows, "snapshot_id int, n_files long, bytes long"
        )
        m = self.read_manifest(spark).groupBy("snapshot_id").agg(
            F.sum("rows").cast("long").alias("rows"),
            F.sum("payload").cast("long").alias("payload"),
            F.max("watermark_ts").alias("watermark_ts"),
        )
        return listing.join(m, "snapshot_id", "left").orderBy("snapshot_id")

    def expire_snapshots(self) -> list[int]:
        """Physically delete data+manifest dirs older than the base
        snapshot (Iceberg expire_snapshots): reclaims space, destroys time
        travel before the base — call only when history is no longer
        needed. Returns the dropped snapshot ids."""
        base = self.base_snapshot()
        if base is None:
            return []
        dropped = []
        for sid in self._ids(self.data_dir):
            if sid < base:
                shutil.rmtree(self._snap_path(self.data_dir, sid))
                d = self._snap_path(self.manifest_dir, sid)
                if os.path.isdir(d):
                    shutil.rmtree(d)
                dropped.append(sid)
        return dropped

    def diff_rows(
        self,
        spark: SparkSession,
        key_cols: list[str],
        from_snapshot: int | None,
        to_snapshot: int,
    ) -> DataFrame:
        """:meth:`diff` with payloads: (key_cols..., change, _old, _new)
        where ``_old``/``_new`` are structs of the payload columns (NULL
        on the missing side of an I/D). This is the input shape
        incremental view maintenance needs — see
        ``operators/ivm.py::incremental_group_agg``. Same schema-era
        contract and same single full-outer join as :meth:`diff`."""
        new = self.read_current(spark, key_cols, to_snapshot)
        payload_cols = [
            c for c in new.columns
            if c not in key_cols and c != "snapshot_id"
        ]
        fp = F.xxhash64(*[F.col(c) for c in payload_cols]) if payload_cols \
            else F.lit(0)
        b = new.select(
            *key_cols,
            F.struct(*payload_cols).alias("_new"),
            fp.alias("_fp_b"),
        )
        if from_snapshot is None:
            return b.select(
                *key_cols,
                F.lit("I").alias("change"),
                F.lit(None).cast(b.schema["_new"].dataType).alias("_old"),
                "_new",
            )
        old = self.read_current(spark, key_cols, from_snapshot)
        a = old.select(
            *key_cols,
            F.struct(*payload_cols).alias("_old"),
            fp.alias("_fp_a"),
        )
        j = a.join(b, key_cols, "full_outer")
        return (
            j.select(
                *key_cols,
                F.when(F.col("_fp_a").isNull(), "I")
                .when(F.col("_fp_b").isNull(), "D")
                .when(F.col("_fp_a") != F.col("_fp_b"), "U")
                .alias("change"),
                "_old",
                "_new",
            )
            .where(F.col("change").isNotNull())
        )

    def verify(self, spark: SparkSession, key_cols: list[str]) -> DataFrame:
        """Recompute lineage from the data and diff against the manifest —
        returns snapshots that disagree on rows or checksum (empty = intact).
        The checksum is an order-independent sum, so this is partitioning-
        invariant."""
        data = self.read(spark)
        manifest = self.read_manifest(spark)
        recomputed = data.groupBy("snapshot_id").agg(
            F.count(F.lit(1)).alias("rows_actual"),
            _row_checksum(key_cols).alias("checksum_actual"),
        )
        recorded = manifest.groupBy("snapshot_id").agg(
            F.sum("rows").alias("rows_recorded"),
            F.sum("checksum").alias("checksum_recorded"),
        )
        return recomputed.join(recorded, "snapshot_id").where(
            (F.col("rows_actual") != F.col("rows_recorded"))
            | (F.col("checksum_actual") != F.col("checksum_recorded"))
        )
