"""Hive-partitioned parquet writer (SURVEY §2A A7, A9-A14).

The reference's flush path: columnar buffer → Arrow record → one
``tmp/{uuid}.1.parquet`` per partition → atomic rename into
``date=…/hour=…/`` → metadata.json update (hive_partition.go:116-177,
save_service_fs.go:65-113). Here the same contract is expressed Spark-first:

- date/hour derive from the table's time column **in the data** (true
  hourly bucketing — deliberately fixing the reference's day-bucket id /
  hour-label mismatch, registry.go:107-131; SURVEY §7.5),
- rows are sorted by the table's order-by before write so every file is
  a sorted run with tight row-group stats (merge_service_fs.go:215-217
  parity; footer min/max then powers scan pruning),
- Spark's ``partitionBy`` replaces the bitmask scatter machinery
  (AppendByMask, column.go:124-159) — the shuffle IS the scatter,
- the tmp-write-then-rename protocol is kept (staging dir + ``os.replace``)
  so readers never see half-written files.

Driver-side renames assume a posix-rename filesystem (local/NFS/HDFS-style;
on S3 you'd swap the commit step for a manifest commit — same structure the
reference has with its fs vs s3 save services).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackpipe_spark.catalog import Catalog, Table
from quackpipe_spark.plans.index import FileEntry, fsync_file, locked_index
from quackpipe_spark.types import CANONICAL, infer_canonical

# Parquet row-group length parity (save_service_fs.go:83).
ROW_GROUP_ROWS = 8124


class PartialWriteError(RuntimeError):
    """A multi-partition flush failed AFTER at least one partition was
    published (renamed live + indexed). The write is NOT cleanly
    retryable: a blind retry duplicates the committed partitions' rows.
    The HTTP door maps this to a NON-retryable 422 with explicit wording
    (machine LP clients auto-retry 5xx blind, ADVICE r12), distinct from
    the retry-safe 400 a pre-publish failure earns."""

# canonical type → arrow type for the local flush writer (parity with the
# reference's builders, merge/data_types/*.go)
import pyarrow as _pa

_ARROW_TYPES = {
    "INT8": _pa.int64(),
    "UBIGINT": _pa.int64(),
    "FLOAT8": _pa.float64(),
    "VARCHAR": _pa.string(),
    "BOOLEAN": _pa.bool_(),
}


def columnar_to_df(
    spark: SparkSession, data: dict[str, list], schema: dict[str, str] | None = None
) -> DataFrame:
    """Columnar dict (name → python list) → DataFrame via Arrow DIRECT.

    ``schema`` is the canonical name→type map the caller already
    computed (write_columnar's effective_schema); inference runs only
    when absent. Re-inferring here typed an all-null KNOWN column as
    VARCHAR on the bulk (>5M row) path — a string-typed parquet column
    landing in a table whose other files hold int64, bricking every
    later merged read. Building through pyarrow (not pandas) also keeps
    a None-mixed int column int64-with-nulls: pandas floats it to
    float64, which NaNs hour buckets and rounds epoch-ns (2^63 ≫ 2^53).

    Length validation parity with VerifyData (data_store.go:32-43).
    """
    import pyarrow as pa

    lengths = {k: len(v) for k, v in data.items()}
    if len(set(lengths.values())) > 1:
        raise ValueError(f"ragged columns: {lengths}")
    canon = schema or infer_schema(data)
    try:
        at = pa.table(
            {c: pa.array(vals, type=_ARROW_TYPES[canon[c]]) for c, vals in data.items()}
        )
        return spark.createDataFrame(at)
    except (pa.lib.ArrowInvalid, pa.lib.ArrowTypeError, OverflowError):
        # oddly-typed batch (a value Arrow can't coerce into the declared
        # type, e.g. a float in a first-value-inferred int column): fall
        # back to the pandas route WITH the declared schema — the same
        # fallback _write_columnar_arrow keeps, so write success can't
        # depend on which side of the 5M-row gate a batch lands
        import pandas as pd

        from pyspark.sql.types import StructField, StructType

        fields = StructType(
            [StructField(c, CANONICAL[canon[c]], True) for c in data]
        )
        return spark.createDataFrame(pd.DataFrame(data), fields)


def _hour_rel(hour_epoch: int) -> str:
    """date=YYYY-MM-DD/hour=HH partition label for an epoch-hour (UTC) —
    the single source for BOTH local flush routes (write_df mirrors the
    same floor-of-hour arithmetic in Spark SQL)."""
    import datetime as _dt

    d = _dt.datetime.fromtimestamp(int(hour_epoch) * 3600, _dt.timezone.utc)
    return "date={}/hour={:02d}".format(d.strftime("%Y-%m-%d"), d.hour)


def infer_schema(data: dict[str, list]) -> dict[str, str]:
    out = {}
    for col, vals in data.items():
        sample = next((v for v in vals if v is not None), None)
        canon = infer_canonical(sample) if sample is not None else "VARCHAR"
        if canon == "INT8" and any(
            type(v) is int and v >= (1 << 63) for v in vals
        ):
            # line protocol's 'u' suffix is value-erased by parse time, so
            # a batch mixing small and >= 2^63 ints is ONE uint64 column —
            # typing from the first value alone made the flush outcome
            # depend on row order (review r12): small-first registered
            # INT8 and the later upper-half value killed the whole flush
            canon = "UBIGINT"
        out[col] = canon
    return out


def effective_schema(
    table: Table, data: dict[str, list], fields: dict[str, str] | None = None
) -> dict[str, str]:
    """infer_schema, but an ALL-NULL column carries no type evidence: it
    inherits the table's existing type instead of defaulting to VARCHAR —
    otherwise a typed column receiving a batch of nulls raises a spurious
    type conflict in update_schema AND would be written as a string
    column, breaking the union-by-name read (null is a legal value for
    any type; the reference null-fills). ``fields`` lets a caller that
    already ran infer_schema over the same batch (get_or_create needs it
    too) pass the result in instead of re-scanning every column of a
    multi-million-row flush (review r14)."""
    schema = dict(fields) if fields is not None else infer_schema(data)
    for col, vals in data.items():
        if col in table.schema and all(v is None for v in vals):
            schema[col] = table.schema[col]
    return schema


class HiveWriter:
    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog

    def time_column(self, table: Table) -> str:
        return table.order_by[0] if table.order_by else "__timestamp"

    # Micro-batches below this row count flush through the local Arrow
    # writer — the same architecture as the reference, whose flush is an
    # Arrow RecordBuilder→parquet write (save_service_fs.go:65-113), NOT
    # the query engine. A Spark job per 1-second flush costs ~1s of
    # scheduling for zero distribution benefit at micro-batch sizes; the
    # distributed write path still serves bulk loads and compaction.
    ARROW_FAST_PATH_ROWS = 5_000_000

    def write_columnar(
        self, db: str, name: str, data: dict[str, list], n_rows: int | None = None
    ) -> list[str]:
        """Full ingest path for one schema-homogeneous batch: auto-create
        table, validate/evolve schema, auto-timestamp, partition, write.
        ``n_rows`` supplies the count when ``data`` has no columns (an
        all-null ingest row becomes a pure auto-timestamp row)."""
        # an ALL-NULL column with no existing type is EXCLUDED from the
        # write rather than typed VARCHAR: null carries no evidence, the
        # union-by-name read null-fills absent columns identically, and a
        # VARCHAR guess would permanently lock the column's type — the
        # first batch with a real value then establishes it. (A column the
        # table already knows keeps its type via effective_schema.)
        if data:  # row count BEFORE any column drop below
            n_rows = len(next(iter(data.values())))
        known = self.catalog.get(db, name)
        drop = [
            c
            for c, vals in data.items()
            if all(v is None for v in vals)
            and (known is None or c not in known.schema)
        ]
        if drop:
            data = {c: v for c, v in data.items() if c not in drop}
        fields = infer_schema(data)  # ONE full-batch inference pass
        table = self.catalog.get_or_create(db, name, fields=fields)
        schema = effective_schema(table, data, fields=fields)
        # Auto-timestamp (merge_tree_service.go:268-290): whole batch gets
        # arrival ns when the column is absent.
        tcol = self.time_column(table)
        n = len(next(iter(data.values()))) if data else (n_rows or 0)
        if tcol not in data:
            if not table.auto_timestamp:
                raise ValueError(f"time column {tcol!r} missing and auto_timestamp is off")
            now = time.time_ns()
            data = dict(data)
            data[tcol] = [now] * n
            schema = dict(schema)
            schema[tcol] = "INT8"
        elif any(v is None for v in data[tcol]):
            # per-row null times: fill with arrival ns (the reference
            # stamps arrival time) BEFORE pandas sees the column — a
            # None-mixed int column otherwise becomes float64, which NaNs
            # the hour bucket and rounds epoch-ns values (2^63 ≫ 2^53)
            if not table.auto_timestamp:
                raise ValueError(f"null values in time column {tcol!r} with auto_timestamp off")
            now = time.time_ns()
            data = dict(data)
            data[tcol] = [v if v is not None else now for v in data[tcol]]
            schema = dict(schema)
            schema[tcol] = "INT8"
        self.catalog.update_schema(table, schema)
        # zero-row batches still ran validation + schema evolution above
        # (a batch with typed evidence may evolve the schema even when a
        # sibling column is empty, and a missing time column must still
        # error with auto_timestamp off) — only the physical write is
        # skipped; no-evidence columns were deferred by the drop above
        if n == 0:
            return []
        # UBIGINT rides the int64 slot two's-complement-wrapped, like the
        # reference (uint64.go:13, types.py note): a value >= 2^63 would
        # otherwise OverflowError out of pa.array / overflow pandas, and
        # the reference's documented semantic IS the wrap
        for c, canon in schema.items():
            if canon == "UBIGINT" and c in data and any(
                v is not None and v >= (1 << 63) for v in data[c]
            ):
                data = dict(data)
                data[c] = [
                    v - (1 << 64) if v is not None and v >= (1 << 63) else v
                    for v in data[c]
                ]
        if n <= self.ARROW_FAST_PATH_ROWS:
            return self._write_columnar_arrow(table, data, schema)
        df = columnar_to_df(self.spark, data, schema)
        return self.write_df(table, df, level=1, one_file_per_partition=True)

    def _write_columnar_arrow(
        self, table: Table, data: dict[str, list], schema: dict[str, str]
    ) -> list[str]:
        """Local Arrow flush: sort by order-by, split into date/hour
        partitions, one parquet file per partition (row-group 8124,
        save_service_fs.go:83), tmp+rename commit, index upsert.

        Conversion is list→Arrow DIRECT (pa.array per column): routing the
        Python lists through a pandas DataFrame first cost 2.1s of the
        2.9s flush of a 2M-row buffer — 3.5× the entire pure-Arrow
        pipeline (build 0.3s + stable multi-key sort 0.1s + parquet write
        0.37s). Oddly-typed batches (e.g. a value Arrow can't coerce into
        the declared type) fall back to the pandas route, which carries
        pandas' looser coercions."""
        import pyarrow as pa
        import pyarrow.compute as pc

        tcol = self.time_column(table)
        cols = list(data.keys())
        try:
            at = pa.table(
                {
                    c: pa.array(data[c], type=_ARROW_TYPES[schema.get(c, "VARCHAR")])
                    for c in cols
                }
            )
        except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
            # OverflowError: pa.array raises it (not ArrowInvalid) for
            # python ints ≥ 2^63 — which line protocol's uint64 form
            # legitimately delivers; it must reach the same fallback, not
            # fail the whole merged table buffer
            return self._write_columnar_pandas(table, data, schema)
        order_cols = [c for c in table.order_by if c in cols]
        if order_cols:
            # Arrow's sort_indices is stable — same tie order as the
            # previous pandas mergesort
            at = at.take(
                pc.sort_indices(at, sort_keys=[(c, "ascending") for c in order_cols])
            )
        if table.partition_by:
            # per-row strftime is the flush hot spot; a micro-batch spans
            # only a handful of distinct hours — format just the uniques.
            # Hour bucketing stays INTEGER floor-division on the raw int64
            # ns (a float64 round-trip would lose ns precision above 2^53
            # and can flip rows across an hour boundary). The split is a
            # stable argsort + contiguous zero-copy slices — a per-unique
            # full-column filter was O(rows × distinct hours), which a
            # year-spanning historical backfill (8760 hours) turned into
            # ~10^10 element ops on the flush thread (review r12).
            import numpy as np

            arr = at[tcol].combine_chunks().to_numpy(zero_copy_only=False)
            hour_epoch = arr // 3_600_000_000_000
            order = np.argsort(hour_epoch, kind="stable")  # identity when
            # already time-sorted (the usual order_by), so intra-hour row
            # order matches the previous filter-per-hour exactly
            at = at.take(pa.array(order))
            hs = hour_epoch[order]
            bounds = np.flatnonzero(np.diff(hs)) + 1
            starts = [0, *bounds.tolist()]
            ends = [*bounds.tolist(), len(hs)]
            parts = [
                (_hour_rel(int(hs[s])), at.slice(s, e - s))
                for s, e in zip(starts, ends)
            ]
        else:
            parts = [("", at)]
        return self._flush_parts(table, parts, tcol)

    def _flush_parts(self, table: Table, parts: list, tcol: str) -> list[str]:
        """Two-phase flush commit shared by the Arrow and pandas routes:
        stage EVERY partition's parquet into tmp/ first, then publish
        (rename + index upsert) each. A failure during staging publishes
        nothing — the client's 400 is safely retryable; a failure after
        the first publish raises PartialWriteError, which the HTTP door
        maps to a non-retryable 422 'do not blindly retry' (any status a
        machine client auto-retries would duplicate the committed
        partitions; 5xx is exactly that class — ADVICE r12)."""
        staged: list[tuple[str, str, str, object]] = []  # rel, name, tmp, at
        try:
            for rel, g in parts:
                newname = f"{uuid.uuid4().hex}.1.parquet"
                tmp = os.path.join(table.tmp_dir(), newname)
                pq.write_table(g, tmp, row_group_size=ROW_GROUP_ROWS)
                staged.append((rel, newname, tmp, g))
        except BaseException:
            for _, _, tmp, _g in staged:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
            raise
        out: list[str] = []
        try:
            for rel, newname, tmp, g in staged:
                out.append(self._publish_part(table, rel, newname, tmp, g, tcol))
        except BaseException as e:
            for _, _, tmp, _g in staged[len(out):]:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
            if out:
                raise PartialWriteError(
                    f"{len(out)}/{len(staged)} partitions committed before "
                    f"failure: {type(e).__name__}: {e}"
                ) from e
            raise
        return out

    def _publish_part(
        self, table: Table, rel: str, newname: str, tmp: str, at, tcol: str
    ) -> str:
        """Publish one staged partition file: rename into the live dir,
        footer-equivalent min/max stats, index upsert."""
        import pyarrow.compute as pc

        live_dir = os.path.join(table.path, rel) if rel else table.path
        os.makedirs(live_dir, exist_ok=True)
        dst = os.path.join(live_dir, newname)
        # data blocks durable before the fsync-hardened index references
        # the file (review r14; the index save's dir fsync covers the
        # rename's dentry)
        fsync_file(tmp)
        os.replace(tmp, dst)
        body_done = False
        try:
            if tcol in at.column_names:
                mm = pc.min_max(at[tcol]).as_py()
                tmin, tmax = mm["min"], mm["max"]
            else:
                tmin = tmax = None
            with locked_index(live_dir) as idx:
                idx.add(
                    FileEntry(
                        name=newname,
                        size_bytes=os.path.getsize(dst),
                        row_count=at.num_rows,
                        min_time=int(tmin) if tmin is not None else None,
                        max_time=int(tmax) if tmax is not None else None,
                    )
                )
                body_done = True  # locked_index SAVES after the body: an
                # exception past this point may land with the index
                # already durably referencing dst
        except BaseException as e:
            # the partition COMMITS at the index upsert, not the rename
            # (readers resolve files through the index) — roll the rename
            # back so "not committed" stays provably true: a renamed-but-
            # unindexed file would otherwise leak as an orphan that a
            # blind retry turns into duplicate rows for any direct-
            # directory consumer (review r12 follow-up). But ONLY when
            # the failure provably preceded the index save (body_done
            # False — locked_index skips save on body exceptions):
            # unlinking dst after a possibly-committed save would delete
            # data the metadata references — loss, not rollback.
            if body_done:
                raise PartialWriteError(
                    f"partition {rel or '<root>'}: index publish of "
                    f"{newname} interrupted mid-save ({type(e).__name__}: "
                    f"{e}); the file may already be referenced"
                ) from e
            try:
                os.unlink(dst)
            except OSError:
                raise PartialWriteError(
                    f"partition {rel or '<root>'} left a live un-indexed "
                    f"file {newname} after {type(e).__name__}: {e}"
                ) from e
            raise
        return dst

    def _write_columnar_pandas(
        self, table: Table, data: dict[str, list], schema: dict[str, str]
    ) -> list[str]:
        """Fallback flush via pandas for batches Arrow can't coerce
        directly (pandas' looser per-value coercions apply) — the
        pre-r7 conversion route, kept verbatim."""
        import pandas as pd
        import pyarrow as pa

        tcol = self.time_column(table)
        pdf = pd.DataFrame(data)
        arrow_fields = [
            pa.field(c, _ARROW_TYPES[schema.get(c, "VARCHAR")], nullable=True)
            for c in pdf.columns
        ]
        order_cols = [c for c in table.order_by if c in pdf.columns]
        if order_cols:
            pdf = pdf.sort_values(order_cols, kind="mergesort")
        if table.partition_by:
            hour_epoch = pdf[tcol].to_numpy() // 3_600_000_000_000
            groups = pdf.groupby(hour_epoch, sort=False)
            parts = [(_hour_rel(h), g) for h, g in groups]
        else:
            parts = [("", pdf)]
        return self._flush_parts(
            table,
            [
                (
                    rel,
                    pa.Table.from_pandas(
                        g.reset_index(drop=True),
                        schema=pa.schema(arrow_fields),
                        preserve_index=False,
                    ),
                )
                for rel, g in parts
            ],
            tcol,
        )

    _SPARK_TO_CANONICAL = {
        "bigint": "INT8",
        "double": "FLOAT8",
        "string": "VARCHAR",
        "boolean": "BOOLEAN",
    }

    def write_parsed_df(self, db: str, name: str, df: DataFrame) -> list[str]:
        """write_columnar's contract for an already-distributed DataFrame
        (the bulk/backfill ingest door): auto-create + validate/evolve
        schema + auto-timestamp + sorted hive write — without the rows
        ever visiting the driver."""
        unmapped = [(c, t) for c, t in df.dtypes if t not in self._SPARK_TO_CANONICAL]
        if unmapped:
            # reject loudly: silently dropping a column from the catalog
            # while still writing it to parquet gives the table a schema
            # that depends on which files a query happens to scan
            raise TypeError(
                f"columns outside the engine's type system {unmapped}: cast to "
                f"one of {sorted(self._SPARK_TO_CANONICAL)} before ingest"
            )
        schema = {c: self._SPARK_TO_CANONICAL[t] for c, t in df.dtypes}
        table = self.catalog.get_or_create(db, name, fields=schema)
        # a Spark bigint is the PHYSICAL slot for both INT8 and UBIGINT
        # (CANONICAL maps both to LongType); a table whose column was
        # established as UBIGINT via line-protocol ('123u') must accept a
        # bigint backfill as-is, not raise a spurious UBIGINT-vs-INT8
        # conflict — keep the existing canonical type when the physical
        # types agree
        for c, canon in list(schema.items()):
            known = table.schema.get(c)
            if (
                known is not None
                and known != canon
                and CANONICAL[known] == CANONICAL[canon]
            ):
                schema[c] = known
        tcol = self.time_column(table)
        if table.auto_timestamp and tcol not in df.columns:
            # whole batch stamped with arrival ns (merge_tree_service.go:
            # 268-290), matching the driver-side write_columnar path
            df = df.withColumn(tcol, F.lit(time.time_ns()).cast("long"))
            schema = dict(schema)
            schema[tcol] = "INT8"
        elif tcol in df.columns:
            # per-row NULL times: same contract as write_columnar — fill
            # with arrival ns under auto_timestamp, refuse otherwise. A
            # passed-through NULL previously landed the row in
            # date=__HIVE_DEFAULT_PARTITION__: a dir the pruner never
            # prunes, holding rows no time-range filter can ever match —
            # mislabeled, effectively invisible data (review r14)
            if table.auto_timestamp:
                df = df.withColumn(
                    tcol,
                    F.coalesce(F.col(tcol), F.lit(time.time_ns()).cast("long")),
                )
            else:
                # refusal rides the staging write itself (raise_error on
                # the first NULL row — no extra validation job), which
                # fails BEFORE any commit, so the client's error is
                # safely retryable
                df = df.withColumn(
                    tcol,
                    F.when(
                        F.col(tcol).isNull(),
                        F.raise_error(
                            F.lit(
                                f"null values in time column {tcol!r} "
                                "with auto_timestamp off"
                            )
                        ).cast("long"),
                    ).otherwise(F.col(tcol)),
                )
        self.catalog.update_schema(table, schema)
        return self.write_df(table, df, level=1, one_file_per_partition=True)

    def write_df(
        self,
        table: Table,
        df: DataFrame,
        level: int = 1,
        one_file_per_partition: bool = True,
    ) -> list[str]:
        """Partition + sorted write + rename-commit + index update."""
        tcol = self.time_column(table)
        if dict(df.dtypes).get(tcol) != "bigint":
            raise TypeError(f"time column {tcol!r} must be int64 epoch ns")
        partitioned = bool(table.partition_by)
        if partitioned:
            # pure integer floor arithmetic, NOT date_format(timestamp):
            # (a) date_format renders in the session timezone, which
            # /query can mutate at runtime — labels must stay UTC like
            # the Arrow flush path and the pruner assume; (b) `DIV`
            # truncates toward zero, splitting pre-1970 hours across two
            # mislabeled dirs, while (ts - pmod(ts, H)) is an exact
            # multiple of H so its DIV is a true floor at any sign.
            # (CAST(DateType AS STRING) is timezone-free.)
            H = 3_600_000_000_000  # ns per hour
            he = f"((`{tcol}` - pmod(`{tcol}`, {H})) DIV {H})"
            days = f"(({he} - pmod({he}, 24)) DIV 24)"
            staged = (
                df.withColumn(
                    "date",
                    F.expr(
                        f"CAST(date_add(DATE'1970-01-01', CAST({days} AS INT)) AS STRING)"
                    ),
                )
                .withColumn(
                    "hour",
                    F.expr(f"lpad(CAST(pmod({he}, 24) AS STRING), 2, '0')"),
                )
            )
        else:
            # "Merge" engine: flat directory, no hive dirs (registry.go:184-190)
            staged = df
        if one_file_per_partition:
            # one sorted file per flush per partition (reference parity:
            # one .1.parquet per Save, hive_partition.go:116-177)
            staged = staged.repartition("date", "hour") if partitioned else staged.coalesce(1)
        # partition cols lead the sort: the dynamic-partition writer re-sorts
        # any task whose rows aren't clustered by partition value (and that
        # sort is NOT stable on the remaining keys) — pre-sorting by
        # (date, hour, order_by) satisfies its requirement so files keep
        # the order-by clustering
        sort_cols = (["date", "hour"] if partitioned else []) + list(table.order_by)
        staged = staged.sortWithinPartitions(*[F.asc(c) for c in sort_cols])

        stage_dir = os.path.join(table.tmp_dir(), uuid.uuid4().hex)
        writer = staged.write.mode("overwrite").option(
            "parquet.block.size", 8 * 1024 * 1024
        )
        if partitioned:
            writer = writer.partitionBy("date", "hour")
        writer.parquet(stage_dir)
        written = self._commit(table, stage_dir, level, tcol)
        shutil.rmtree(stage_dir, ignore_errors=True)
        return written

    def _commit(self, table: Table, stage_dir: str, level: int, tcol: str) -> list[str]:
        """Move staged part-files into live partition dirs as
        {uuid}.{level}.parquet + upsert the partition index — with the
        SAME two-phase error contract as _flush_parts (review r14): a
        failure before ANY dir's index save rolls back this dir's renames
        and re-raises (the client's 400 is safely retryable — nothing
        committed); a failure after the first dir committed (or one that
        may have, mid-save) raises PartialWriteError so the HTTP door's
        non-retryable 422 stops a blind retry from duplicating the
        committed partitions. Each data file fsyncs before its rename so
        the fsync-hardened index never durably references un-durable
        parquet blocks (the flat-dir journal's lesson); the index save's
        dir fsync covers the rename's dentry."""
        written: list[str] = []
        committed_dirs = 0
        for root, _dirs, files in os.walk(stage_dir):
            parts = [f for f in files if f.endswith(".parquet")]
            if not parts:
                continue
            rel = os.path.relpath(root, stage_dir)  # date=…/hour=… or "." (flat)
            live_dir = table.path if rel == "." else os.path.join(table.path, rel)
            replaced: list[str] = []
            pending: list[str] = []
            body_done = False
            try:
                # per-dir setup INSIDE the classified region: a makedirs
                # failure (ENOSPC/EACCES) on the second partition dir
                # previously escaped as a plain OSError, which api.py
                # maps to a retry-SAFE 503 — and the retry duplicates the
                # already-committed first dir (ADVICE r15)
                os.makedirs(live_dir, exist_ok=True)
                with locked_index(live_dir) as idx:
                    for fname in parts:
                        src = os.path.join(root, fname)
                        newname = f"{uuid.uuid4().hex}.{level}.parquet"
                        dst = os.path.join(live_dir, newname)
                        meta = pq.read_metadata(src)
                        tmin, tmax = _footer_min_max(meta, tcol)
                        fsync_file(src)
                        os.replace(src, dst)
                        replaced.append(dst)
                        idx.add(
                            FileEntry(
                                name=newname,
                                size_bytes=os.path.getsize(dst),
                                row_count=meta.num_rows,
                                min_time=tmin,
                                max_time=tmax,
                            )
                        )
                        pending.append(dst)
                    body_done = True  # past here the save may have run
            except BaseException as e:
                if body_done or committed_dirs:
                    raise PartialWriteError(
                        f"{committed_dirs} partition dir(s) committed "
                        f"before failure in {rel!r}: {type(e).__name__}: {e}"
                    ) from e
                # provably pre-save: roll the renames back so "nothing
                # committed" stays true (a live un-indexed file would
                # leak as an orphan a blind retry duplicates)
                for dst in replaced:
                    try:
                        os.unlink(dst)
                    except OSError:
                        pass
                raise
            committed_dirs += 1
            written.extend(pending)
        return written


def _footer_min_max(meta, col: str) -> tuple[int | None, int | None]:
    """Min/max of a column from parquet footer stats (GetMinMax parity,
    column.go:67-72 — except we read it back instead of tracking in-memory)."""
    try:
        names = meta.schema.names
        ci = names.index(col)
    except ValueError:
        return None, None
    mins, maxs = [], []
    for rg in range(meta.num_row_groups):
        stats = meta.row_group(rg).column(ci).statistics
        if stats is not None and stats.has_min_max:
            mins.append(stats.min)
            maxs.append(stats.max)
    return (min(mins) if mins else None, max(maxs) if maxs else None)
