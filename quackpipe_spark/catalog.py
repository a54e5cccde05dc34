"""Database/table registry over a root directory (SURVEY §2A A6, A25).

Parity with /root/reference/merge/repository/registry.go:23-158: tables key
on (db, name), auto-create on first write ("schema-on-write", README.md:82)
with the HiveMerge defaults (OrderBy=["__timestamp"], hive date/hour
partitioning, registry.go:94-95,184-190). Layout:

    {root}/{db}/{table}/date=YYYY-MM-DD/hour=HH/{uuid}.{level}.parquet
    {root}/{db}/{table}/tmp/            (write-then-rename staging)
    {root}/{db}/{table}/.table.json     (table metadata, ours)

We keep one engine — the hive-partitioned parquet writer — because Spark's
partitioned write subsumes both reference engines ("Merge" flat dir is just
partition_by=[]).
"""

from __future__ import annotations

import json
import logging
import os
import threading
from dataclasses import asdict, dataclass, field
from dataclasses import fields as dataclass_fields

from quackpipe_spark.types import resolve

import re as _re

# db/table identifier contract: word chars only. Names become BOTH
# filesystem path components AND Spark temp-view names at query time —
# Spark rejects dots (multi-part view name) and dashes/spaces (invalid
# identifier) in createOrReplaceTempView, so accepting them here would
# ingest data that every later /query of that table can never read
# (review r12: graphite-style 'cpu.load' measurements bricked at read).
# Rejecting at the write door is loud; the old read-time failure was not.
_IDENT_RE = _re.compile(r"^[A-Za-z0-9_]+$")
# Graphite/Influx measurement names routinely carry dots, dashes, and
# spaces ('cpu.load', 'disk-io'). Rejecting them outright would end
# ingest continuity for those clients (ADVICE r12), so the write door
# SANITIZES instead — the common TSDB convention — mapping each such
# char to '_' before validation. '/' and '\\' are deliberately NOT in
# the map: a traversal attempt ('../..' → '__/__') must still FAIL the
# strict check, never be laundered into a valid name.
_SANITIZE_RE = _re.compile(r"[.\- ]")


def sanitize_ident(value: str) -> str:
    """Map measurement-name punctuation ('.', '-', ' ') to '_'."""
    return _SANITIZE_RE.sub("_", value)


def _check_ident(kind: str, value: str) -> None:
    if not value or not _IDENT_RE.match(value):
        raise ValueError(
            f"invalid {kind} name {value!r}: must match [A-Za-z0-9_]+ "
            "(names become filesystem path components and Spark view names; "
            "dots/dashes are not queryable as Spark temp views)"
        )


@dataclass
class Table:
    """Mirror of shared.Table (merge/shared/table.go:32-41)."""

    database: str
    name: str
    path: str
    engine: str = "HiveMerge"
    order_by: list[str] = field(default_factory=lambda: ["__timestamp"])
    partition_by: list[str] = field(default_factory=lambda: ["date", "hour"])
    auto_timestamp: bool = True
    schema: dict[str, str] = field(default_factory=dict)  # col → canonical type

    META_NAME = ".table.json"

    def meta_path(self) -> str:
        return os.path.join(self.path, self.META_NAME)

    def tmp_dir(self) -> str:
        return os.path.join(self.path, "tmp")

    def save(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        os.makedirs(self.tmp_dir(), exist_ok=True)
        tmp = self.meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=2)
        os.replace(tmp, self.meta_path())

    @classmethod
    def load(cls, path: str) -> "Table":
        with open(os.path.join(path, cls.META_NAME)) as f:
            meta = json.load(f)
        # The DISCOVERED directory is authoritative, not the absolute path
        # recorded at write time: after a root move/restore the stale path
        # makes every query return empty AND resurrects the old directory
        # on the next write (split-brain storage, no error anywhere).
        meta["path"] = path
        # tolerate unknown fields (the PartitionIndex lesson, review r12:
        # one new field from a newer writer binary must not brick a
        # querier container sharing the filesystem) — known fields decide
        known = {f.name for f in dataclass_fields(cls)}
        return cls(**{k: v for k, v in meta.items() if k in known})

    def partition_dirs(self) -> list[str]:
        """Live partition directories (…/date=D/hour=H), or the table root
        for flat "Merge"-engine tables."""
        out = []
        if not os.path.isdir(self.path):
            return out
        if not self.partition_by:
            return [self.path]
        for dname in sorted(os.listdir(self.path)):
            dpath = os.path.join(self.path, dname)
            if not (os.path.isdir(dpath) and dname.startswith("date=")):
                continue
            subs = [
                os.path.join(dpath, h)
                for h in sorted(os.listdir(dpath))
                if h.startswith("hour=")
            ]
            out.extend(subs) if subs else out.append(dpath)
        return out


class Catalog:
    """In-process registry with per-table serialization of schema updates
    (the reference serializes via per-table mutexes, registry.go:65-84)."""

    def __init__(self, root: str):
        self.root = root
        self._tables: dict[tuple[str, str], Table] = {}
        self._lock = threading.Lock()
        self._discover()

    def _discover(self) -> None:
        """Re-register tables found on disk (restart path; parity with
        discoverPartitions, hive_merge_tree_service.go:165-218)."""
        if not os.path.isdir(self.root):
            return
        for db in os.listdir(self.root):
            dbdir = os.path.join(self.root, db)
            if not os.path.isdir(dbdir):
                continue
            for name in os.listdir(dbdir):
                tdir = os.path.join(dbdir, name)
                if os.path.exists(os.path.join(tdir, Table.META_NAME)):
                    # per-table isolation: ONE corrupt/truncated
                    # .table.json (external copy, mid-write crash of
                    # another container) must not abort the whole scan —
                    # that took down server startup and every
                    # rediscover() tick for ALL healthy tables
                    # (review r14). Loud log; the table becomes
                    # addressable again once its metadata is repaired.
                    try:
                        t = Table.load(tdir)
                    except Exception:
                        logging.getLogger(__name__).exception(
                            "skipping table dir %s: unreadable %s",
                            tdir,
                            Table.META_NAME,
                        )
                        continue
                    self._tables[(db, name)] = t

    def rediscover(self) -> None:
        """Public re-scan seam for a pure-QUERIER process: the reference's
        headline deployment runs writer and querier as separate containers
        sharing only the filesystem (README.md:41-52, docker-compose.yml),
        and the querier learns about tables the writer created from
        .table.json alone (discoverPartitions ticker,
        hive_merge_tree_service.go:165-218). Safe to call on a ticker:
        reloads every .table.json under root, replacing in-memory Table
        objects with their on-disk state. A writer process should NOT
        ticker this — its own in-memory registry is the source of truth
        between saves; the disk state is for OTHER processes."""
        with self._lock:
            self._discover()

    def get(self, db: str, name: str) -> Table | None:
        # raw-spelling lookups must resolve to the table the write door
        # SANITIZED the name into, or every get()+get_or_create pair
        # ('/gigapi/create' exists-check, validate_schema, write_columnar)
        # sees None for 'cpu.load' while the table lives as 'cpu_load'
        # (review r13). Exact match first so legacy dotted tables keep
        # winning their own spelling; then raw-db+sanitized-name (a new
        # punctuated measurement inside a LEGACY db keeps the db
        # spelling); then sanitized-db+raw-name (a LEGACY dotted table
        # living under a word-char db, addressed with a punctuated db
        # spelling — ADVICE r14); then fully sanitized.
        for key in (
            (db, name),
            (db, sanitize_ident(name)),
            (sanitize_ident(db), name),
            (sanitize_ident(db), sanitize_ident(name)),
        ):
            t = self._tables.get(key)
            if t is not None:
                return t
        return None

    def get_or_create(
        self,
        db: str,
        name: str,
        fields: dict[str, str] | None = None,
        engine: str = "HiveMerge",
        order_by: list[str] | None = None,
    ) -> Table:
        """Auto-create on first write (registry.go:67-85). db/table names
        are validated BEFORE touching the filesystem: they come straight
        off the HTTP surface (measurement names, ?db/?table params) and
        feed os.path.join — an unchecked '../..' or absolute name would
        write .table.json and parquet anywhere the process can reach.

        Continuity rules (ADVICE r12): a name already in the catalog —
        discovered from disk under the pre-r12 looser contract (dotted /
        dashed) — is exempt from validation so existing ingest keeps
        flowing; otherwise measurement punctuation is sanitized to '_'
        ('cpu.load' → 'cpu_load') and the result strictly validated.
        Migration note for pre-existing dotted/dashed tables: they stay
        writable under their original spelling but are not addressable
        as Spark temp views at /query time — rename the directory (and
        .table.json name field) to the sanitized form to restore reads;
        new writes to the sanitized spelling create a SEPARATE table.
        """
        if order_by is not None:
            # a YAML/JSON scalar ('order_by: ts') is the natural spelling
            # of a one-column key — accept it; anything else non-listy
            # would otherwise be stored verbatim and ITERATED AS
            # CHARACTERS downstream (time_column = order_by[0] == 't',
            # silent mis-bucketing; review r12)
            if isinstance(order_by, str):
                order_by = [order_by]
            if not (
                isinstance(order_by, (list, tuple))
                and order_by
                and all(isinstance(c, str) and c for c in order_by)
            ):
                raise ValueError(
                    f"order_by must be a column name or list of column "
                    f"names, got {order_by!r}"
                )
            order_by = list(order_by)
        with self._lock:
            # Membership check AND legacy-db scan run under the lock
            # (ADVICE r14): HTTP handler threads call this concurrently
            # while creation inserts into self._tables below — iterating
            # the live dict outside the lock can raise RuntimeError
            # ("dictionary changed size during iteration"), a spurious 500
            # on concurrent first-writes of new measurements.
            if (db, name) not in self._tables:
                sname = sanitize_ident(name)
                if (db, sname) in self._tables:
                    # HOT-path short circuit (review r14): steady-state
                    # ingest of a punctuated measurement resolves here on
                    # every batch — (db, sname) existing implies the db
                    # spelling is live, which is exactly what the legacy
                    # scan below would conclude, without the O(N-tables)
                    # any() under the catalog-wide lock per batch.
                    name = sname
                    _check_ident("table", name)
                else:
                    # db-component continuity (review r13): a database
                    # already on disk under the legacy dotted/dashed
                    # contract keeps its spelling for NEW measurements too
                    # — sanitizing only the new table's db would silently
                    # split one logical db in two directories (old
                    # measurements under legacy.db/, new under
                    # legacy_db/). Discovered names come from os.listdir,
                    # so a legacy db spelling can never smuggle a path
                    # separator.
                    legacy_db = any(d == db for (d, _n) in self._tables)
                    if not legacy_db:
                        db = sanitize_ident(db)
                        _check_ident("db", db)
                    name = sname
                    _check_ident("table", name)
            t = self._tables.get((db, name))
            if t is None:
                pby = ["date", "hour"] if engine == "HiveMerge" else []
                clash = [c for c in (fields or {}) if c in pby]
                if clash:
                    raise ValueError(
                        f"column name(s) {clash} are reserved: derived hive "
                        "partition columns (see update_schema)"
                    )
                t = Table(
                    database=db,
                    name=name,
                    path=os.path.join(self.root, db, name),
                    engine=engine,
                    order_by=order_by or ["__timestamp"],
                    partition_by=pby,
                    schema={c: resolve(ty) for c, ty in (fields or {}).items()},
                )
                t.save()
                self._tables[(db, name)] = t
            return t

    def update_schema(self, t: Table, new_cols: dict[str, str]) -> None:
        """Union-by-name schema evolution with type-conflict rejection
        (data_store.go:40-43; hive_merge_tree_service.go:309-329).

        Partition-column names (date/hour for HiveMerge) are rejected as
        DATA columns: the writer derives them from the time column, so a
        user column of the same name is either silently replaced (bulk
        path) or collides with partition discovery at read time
        (AnalysisException 'duplicate column in data and partition
        schema'), bricking every later query of the table."""
        from quackpipe_spark.types import CANONICAL

        with self._lock:
            resolved: dict[str, str] = {}
            for col, canon in new_cols.items():
                if col in t.partition_by:
                    raise ValueError(
                        f"column name {col!r} is reserved: it is a derived "
                        f"hive partition column of table {t.name!r}"
                    )
                prev = t.schema.get(col)
                if prev is not None and prev != canon:
                    if CANONICAL[prev] == CANONICAL[canon]:
                        # INT8 ↔ UBIGINT share the int64 physical slot (the
                        # reference funnels uint64 through int64 too) — not
                        # a type change, a WIDENING: once either side has
                        # seen upper-half evidence the column is UBIGINT.
                        # Rejecting this made a protocol-legal uint64 column
                        # whose values straddle 2^63 unable to ever fully
                        # ingest over HTTP (review r12; write_parsed_df
                        # already applied this leniency locally).
                        canon = "UBIGINT" if "UBIGINT" in (prev, canon) else prev
                    else:
                        raise TypeError(
                            f"column {col!r}: type conflict {prev} vs {canon} "
                            f"(schema-on-write rejects type changes)"
                        )
                resolved[col] = canon
            changed = any(t.schema.get(c) != v for c, v in resolved.items())
            t.schema.update(resolved)
            if changed:
                t.save()

    def tables(self, db: str | None = None) -> list[Table]:
        # snapshot under the lock: HTTP handler threads insert via
        # get_or_create while the merge ticker iterates — an unlocked
        # iteration dies with "dictionary changed size during iteration"
        with self._lock:
            items = sorted(self._tables.items())
        return [t for (d, _), t in items if db is None or d == db]
