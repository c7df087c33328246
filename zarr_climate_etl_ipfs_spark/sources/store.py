"""GridStore — the publish/write path (SURVEY.md §2.1 S11-S17, §3.3).

The reference writes Zarr with three update modes (utils/publish.py:240-397):
initial (mode="w"), append (append_dim=time), and region-insert
(region={time: slice}). Here the store is a time-bucket-partitioned Parquet
table and the modes become:

  initial → overwrite the table            (write_initial_zarr, publish.py:240-261)
  append  → mode("append")                 (append_to_dataset, publish.py:373-397)
  insert  → dynamic partition overwrite of only the affected time buckets
            (insert_into_dataset, publish.py:332-371) — the W1 contiguous
            ranges tell us which buckets to rewrite; within each bucket we
            keep rows whose time is NOT being replaced (anti-join) and union
            the replacement rows, so the rewrite granularity exactly matches
            the update keys, never clobbering neighbors (SURVEY.md §7 risk #3).

Scale design: partition grain (descriptor.time_bucket) is the analog of the
Zarr time-chunk spec (chirps.py:26-28). A bucket holds one calendar unit of
cells; at CHIRPS-0.05 scale (2000×7200 grid, daily) a "month" bucket is
~430M cells ≈ 1.7 GB float32 → a handful of ~128 MB parquet files after the
pre-write repartition, matching the reference's 100-200 MB chunk target
(docs/etl_developers_manual.md:137). Sort-within-partitions by (lat, lon)
gives row-group min/max stats → lat/lon predicate pushdown approximates
Z-order locality.

Transactional semantics: the reference brackets writes with
``update_in_progress`` metadata flags readers can observe mid-write
(publish.py:153-180). Parquet dynamic-overwrite is atomic per partition but
not per commit; we keep the reference's flag protocol (as properties.json)
for parity and document that Delta/Iceberg would subsume it (SURVEY.md §4).
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zarr_climate_etl_ipfs_spark.config import DatasetDescriptor
from zarr_climate_etl_ipfs_spark.operators.updates import (
    split_update_times,
    validate_update,
)

_BUCKET_FMT = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy"}
_BUCKET_COL = "time_bucket"


class StoreError(RuntimeError):
    pass


class GridStore:
    """One published dataset at ``root/<dataset_name>/``: a partitioned parquet
    table + ``_meta/`` (properties.json, versions.jsonl)."""

    def __init__(
        self,
        root: str | Path,
        desc: DatasetDescriptor,
        spark: SparkSession,
        compression: str = "zstd",
    ):
        self.desc = desc
        self.spark = spark
        self.root = Path(root) / desc.dataset_name
        self.data_path = self.root / "data"
        self.meta_path = self.root / "_meta"
        # F14 (metadata.py:803-818): the Blosc-or-none choice becomes the
        # parquet codec option; "uncompressed" is the IPFS-dedup analog.
        self.compression = compression

    # -- open / existence (S11) ---------------------------------------------

    def has_existing(self) -> bool:
        return self.data_path.exists() and any(self.data_path.iterdir())

    def dataset(self) -> DataFrame:
        """Open the published table (StoreInterface.dataset, store.py:154-170).

        The partition column is re-derivable, so we drop it from the logical
        view; partition pruning still applies because filters on the time dim
        are rewritten onto the bucket by ``_with_bucket`` on the write side
        and by readers using :meth:`time_sliced`.
        """
        if not self.has_existing():
            raise StoreError(f"no dataset at {self.data_path}")
        return self.spark.read.parquet(str(self.data_path)).drop(_BUCKET_COL)

    def time_sliced(self, start: dt.datetime, end: dt.datetime) -> DataFrame:
        """P1 time-slice with explicit bucket pruning: the bucket predicate is
        derived from the time predicate so the scan only lists the touched
        partitions even though readers filter on the raw time column."""
        td = self.desc.time_dim
        df = self.spark.read.parquet(str(self.data_path))
        fmt = _BUCKET_FMT[self.desc.time_bucket]
        lo = start.strftime(fmt.replace("yyyy", "%Y").replace("MM", "%m").replace("dd", "%d"))
        hi = end.strftime(fmt.replace("yyyy", "%Y").replace("MM", "%m").replace("dd", "%d"))
        return (
            df.filter(F.col(_BUCKET_COL).between(lo, hi))
            .filter(F.col(td).between(F.lit(start), F.lit(end)))
            .drop(_BUCKET_COL)
        )

    # -- write modes (S13-S16) ----------------------------------------------

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        fmt = _BUCKET_FMT[self.desc.time_bucket]
        return df.withColumn(_BUCKET_COL, F.date_format(F.col(self.desc.time_dim), fmt))

    def _layout(self, df: DataFrame) -> DataFrame:
        """Pre-write layout: one shuffle keyed by bucket (the storage grain),
        rows sorted by (lat, lon, time) inside each file for row-group
        min-max locality — the repartition+sortWithinPartitions analog of the
        reference's pre-write ``.chunk(requested_dask_chunks)``
        (publish.py:251-256)."""
        sort_cols = [c for c in ("latitude", "longitude") if c in df.columns]
        return df.repartition(F.col(_BUCKET_COL)).sortWithinPartitions(
            _BUCKET_COL, *sort_cols, self.desc.time_dim
        )

    def write_initial(self, df: DataFrame, dry_run: bool = False) -> None:
        """S13: full overwrite."""
        if dry_run:
            return
        self.meta_path.mkdir(parents=True, exist_ok=True)
        self._flag_update(True, append_only=False)
        out = self._layout(self._with_bucket(df.select(*self.desc.schema().fieldNames())))
        out.write.mode("overwrite").option("compression", self.compression).partitionBy(_BUCKET_COL).parquet(str(self.data_path))
        self._flag_update(False, append_only=False)
        self._log_version("initial", df)

    def append(self, df: DataFrame, dry_run: bool = False) -> None:
        """S14: extend along the time dim (update_is_append_only=True)."""
        if dry_run:
            return
        self._flag_update(True, append_only=True)
        out = self._layout(self._with_bucket(df.select(*self.desc.schema().fieldNames())))
        out.write.mode("append").option("compression", self.compression).partitionBy(_BUCKET_COL).parquet(str(self.data_path))
        self._flag_update(False, append_only=True)
        self._log_version("append", df)

    def insert(self, df: DataFrame, dry_run: bool = False) -> None:
        """S15: overwrite existing time steps in place.

        Only the buckets containing replaced steps are rewritten (dynamic
        partition overwrite); untouched rows in those buckets are carried
        over via an anti-join on the time key.
        """
        if dry_run:
            return
        td = self.desc.time_dim
        update = self._with_bucket(df.select(*self.desc.schema().fieldNames()))
        replaced_times = update.select(td).distinct()
        touched = [r[0] for r in update.select(_BUCKET_COL).distinct().collect()]
        existing = self.spark.read.parquet(str(self.data_path)).filter(
            F.col(_BUCKET_COL).isin(touched)
        )
        keep = existing.join(F.broadcast(replaced_times), td, "left_anti")
        out = self._layout(keep.unionByName(update))
        self._flag_update(True, append_only=False)
        # Reading and overwriting the same partitions in one job is unsafe
        # (lazy scan races partition deletion), so: stage the rewritten
        # buckets, then swap directories. This is the hand-rolled version of
        # the commit a transactional table format performs; the in-progress
        # flag brackets the non-atomic window exactly as the reference's
        # update_in_progress does (publish.py:153-180).
        staging = self.root / "_staging_insert"
        if staging.exists():
            shutil.rmtree(staging)
        out.write.mode("overwrite").option("compression", self.compression).partitionBy(_BUCKET_COL).parquet(str(staging))
        for b in touched:
            src = staging / f"{_BUCKET_COL}={b}"
            dst = self.data_path / f"{_BUCKET_COL}={b}"
            if src.exists():
                if dst.exists():
                    shutil.rmtree(dst)
                src.rename(dst)
        shutil.rmtree(staging)
        self._flag_update(False, append_only=False)
        self._log_version("insert", df)

    def update(self, df: DataFrame, dry_run: bool = False) -> dict[str, int]:
        """The parse orchestration (publish.py:265-397 ``update_zarr``):
        split update keys into inserts/appends (J1), run the Q5 guards,
        honor allow_overwrite (publish.py:287-294), then insert + append.
        """
        desc = self.desc
        td = desc.time_dim
        existing_times = self.dataset().select(td).distinct()
        update_times = df.select(td).distinct()
        val = validate_update(
            existing_times,
            update_times,
            desc.expected_delta,
            time_dim=td,
            dataset_start=desc.dataset_start_date,
            cadence_bounds=desc.update_cadence_bounds,
        )
        if not val.ok:
            raise StoreError("; ".join(val.errors))
        inserts, appends = split_update_times(existing_times, update_times, td)
        # Materialize the key lists now: they are metadata-scale (distinct
        # time steps), and the write phase must not re-execute plans that
        # scan the pre-write file listing (the insert swaps files out).
        ins_keys = [r[td] for r in inserts.collect()]
        app_keys = [r[td] for r in appends.collect()]
        if ins_keys and not desc.allow_overwrite:
            ins_keys = []  # warn-and-skip semantics (publish.py:287-293)
        if ins_keys:
            self.insert(df.filter(F.col(td).isin(ins_keys)), dry_run)
        if app_keys:
            self.append(df.filter(F.col(td).isin(app_keys)), dry_run)
        self.spark.catalog.refreshByPath(str(self.data_path))
        return {"inserts": len(ins_keys), "appends": len(app_keys)}

    # -- metadata (S16/S17, M7) ---------------------------------------------

    def _props_file(self) -> Path:
        return self.meta_path / "properties.json"

    def properties(self) -> dict[str, Any]:
        if self._props_file().exists():
            return json.loads(self._props_file().read_text())
        return {}

    def set_properties(self, **props: Any) -> None:
        """S17 metadata-only write (store.py:397-414): patch properties in
        place without touching data. Dict values are JSON-serialized and None
        becomes "" — the attr-sanitation rule from metadata.py:820-833."""
        cur = self.properties()
        for k, v in props.items():
            if isinstance(v, dict):
                v = json.dumps(v, sort_keys=True)
            if v is None:
                v = ""
            cur[k] = v
        self.meta_path.mkdir(parents=True, exist_ok=True)
        self._props_file().write_text(json.dumps(cur, indent=2, sort_keys=True, default=str))

    def _flag_update(self, in_progress: bool, append_only: bool) -> None:
        self.set_properties(
            update_in_progress=in_progress, update_is_append_only=append_only
        )

    def _log_version(self, action: str, df: DataFrame) -> None:
        td = self.desc.time_dim
        rng = df.agg(F.min(td).alias("lo"), F.max(td).alias("hi"), F.count("*").alias("n")).first()
        self.meta_path.mkdir(parents=True, exist_ok=True)
        with (self.meta_path / "versions.jsonl").open("a") as f:
            f.write(
                json.dumps(
                    {
                        "action": action,
                        "time_start": str(rng["lo"]),
                        "time_end": str(rng["hi"]),
                        "rows": rng["n"],
                    }
                )
                + "\n"
            )
        self.set_properties(
            update_date_range=[str(rng["lo"]), str(rng["hi"])], update_previous_end_date=str(rng["hi"])
        )

    def versions(self) -> list[dict[str, Any]]:
        p = self.meta_path / "versions.jsonl"
        if not p.exists():
            return []
        return [json.loads(line) for line in p.read_text().splitlines() if line]

    def destroy(self) -> None:
        if self.root.exists():
            shutil.rmtree(self.root)
