"""Test-table loading: the driver's TPC-H-ish star schema + streams.

Mirrors the reference's read path — point the engine at parquet and
register a queryable name per table (reference: table-name→file-list
resolution, /root/reference ARCHITECTURE.md "GigAPI Metadata catalog";
registry at merge/repository/registry.go:67-85). In Spark the file
resolution, partition discovery, footer-stat pruning, and schema are all
native to the parquet source, so this is a thin view registry.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# (session, sf_dir, table) → DataFrame. Re-creating a scan per query costs
# a driver round of file listing + footer schema reads; the DataFrame is
# lazy, so sharing it shares only that metadata work, never results. The
# cached entry also pins the session object, so id() keys can't collide.
# Entries of STOPPED sessions are purged on the next cache insert (and
# the cache is size-capped) so a long-lived process that cycles many
# sessions doesn't pin every dead session's JVM plan references forever.
_SCAN_CACHE: dict[tuple[int, str, str], tuple[SparkSession, DataFrame]] = {}
_SCAN_CACHE_CAP = 1024


# Py4J error taxonomy for the liveness probe (ADVICE r14, narrowed in the
# r14 review): Py4JJavaError means the gateway round-trip WORKED and Java
# raised (live JVM, odd shape); Py4JNetworkError means the connection
# itself failed — the gateway is provably gone (crash; the clean stop()
# path nulls _jsc and is handled before the probe). BASE Py4JError is
# deliberately NOT in the dead set: py4j raises it on a LIVE gateway for
# protocol/shape mismatches ("method ... does not exist in the JVM" — the
# exact cross-version drift this probe hedges against), and classifying
# those dead would purge the scan/dialect/IVF/PQ caches on every miss —
# the ADVICE-r12 regression the taxonomy exists to avoid. Import-guarded:
# under Spark Connect py4j may be absent entirely.
try:  # pragma: no cover - import shape depends on the installed Spark
    from py4j.protocol import Py4JJavaError as _Py4JJavaError
    from py4j.protocol import Py4JNetworkError as _Py4JNetworkError

    _PY4J_JAVA_ERROR: tuple = (_Py4JJavaError,)
    _PY4J_DEAD_ERRORS: tuple = (_Py4JNetworkError,)
except Exception:  # pragma: no cover
    _PY4J_JAVA_ERROR = ()
    _PY4J_DEAD_ERRORS = ()


def _session_alive(sess: SparkSession) -> bool:
    # The probe reaches through private classic-Spark internals
    # (_sc._jsc) that don't exist under Spark Connect and may change
    # shape across versions. Two distinct non-answer shapes (review r13):
    # - attribute path ABSENT (Connect/unknown) → assume alive: judging
    #   Connect sessions dead purged the scan/dialect/IVF/PQ caches on
    #   every miss and re-ran expensive prebuilds (ADVICE r12);
    # - _jsc present but None → the session IS stopped: classic
    #   SparkContext.stop() nulls _jsc in its finally, so on the normal
    #   stop path the old isStopped() probe RAISES rather than returning
    #   True — treating that as unknown-alive would make the stopped-
    #   session purge dead code and pin dead JVM refs forever.
    try:
        jsc = sess._sc._jsc
    except Exception:
        return True  # unknown session shape → keep cached
    if jsc is None:
        return False  # classic stop() path: provably stopped
    try:
        return not jsc.sc().isStopped()
    except _PY4J_JAVA_ERROR:
        # the gateway answered and the JAVA side raised — a live JVM with
        # an unexpected shape, not a dead one → keep cached
        return True
    except _PY4J_DEAD_ERRORS:
        # protocol/network failure reaching the gateway: the JVM/Py4J
        # connection died abnormally (crash, not a clean stop() that
        # nulls _jsc). Treating this as alive pinned dead entries in the
        # scan/dialect caches forever (ADVICE r14) — it is provably dead.
        return False
    except Exception:
        return True  # attribute/shape surprises → unknown → keep cached


def _ensure_read_confs(spark: SparkSession) -> None:
    """Make any session able to read the test parquet, not just ours.

    events.parquet carries TIMESTAMP(NANOS) — Spark refuses the read unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is on (ts then arrives as
    bigint epoch-nanos, which is what the engine's time functions expect).
    Sessions built by quackpipe_spark.session set this at build time, but a
    caller-supplied plain session (the correctness driver's, a notebook's)
    won't have it. Both confs are runtime-settable, so set them here, at
    the read boundary, rather than assuming session provenance. UTC keeps
    timestamp rendering aligned with the DuckDB oracle.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down (e.g. Spark Connect policy) — reads may still work


def ntz_epoch_us_expr(col: str) -> str:
    """Epoch-µs of a TIMESTAMP_NTZ column, CALENDAR-PURE: built only from
    wall-clock field extraction (date, hour, minute, fractional second),
    which never consults the session timezone — so naive means UTC by
    construction, at build time AND at action time, under any session.

    The obvious alternatives are all session-tz-dependent at analysis
    time: a NTZ→timestamp cast shifts by the whole zone offset, and even
    timestampdiff against an NTZ epoch literal resolves its operands
    through session-zone casts (measured: a wall time inside the zone's
    DST spring-forward gap shifts by +1h under America/New_York). Field
    extraction has no such seam.
    """
    q = f"`{col}`"
    return (
        f"(cast(unix_date(cast({q} as date)) as bigint) * 86400 "
        f"+ hour({q}) * 3600 + minute({q}) * 60) * 1000000 "
        f"+ cast(extract(SECOND from {q}) * 1000000 as bigint)"
    )


def _normalize_event_time(df: DataFrame) -> DataFrame:
    """Pin the engine's time domain: ``ts`` is int64 epoch-nanoseconds.

    The driver's testdata has shipped ``events.ts`` as both
    TIMESTAMP(NANOS) (rounds 1-3; nanosAsLong delivers bigint directly)
    and TIMESTAMP(MICROS) (round 4+; arrives as timestamp/timestamp_ntz).
    Convert the timestamp forms to epoch-ns here so every downstream
    operator sees one type. The cast + multiply is a Catalyst expression
    folded into the scan projection — no extra pass.

    Timezone handling: NTZ converts via the calendar-pure expression
    (see ntz_epoch_us_expr) — correct under ANY session timezone, which
    matters doubly here because this DataFrame is memoized in
    _SCAN_CACHE and a session-tz-dependent expression would re-resolve
    under whatever zone is current when a cached scan is finally
    collected. Naive == UTC matches how the DuckDB oracle's
    epoch()/epoch_us() treat naive timestamps. The tz-aware branch uses
    unix_micros directly (an instant; tz-independent).

    Pushdown caveat, deliberate: a time-range predicate over the
    CONVERTED column is an expression, so it cannot reach the parquet
    scan (PushedFilters shows only IsNotNull) and timestamp-typed
    sources are filtered post-scan. This is a compat-shim cost only:
    tables the engine writes itself store the time column as int64
    epoch-ns (TIMESTAMP(NANOS) + nanosAsLong reads it as a plain bigint
    attribute), where range predicates push down to row-group stats
    natively — and the query path additionally prunes whole FILES by
    __timestamp range through the partition index before Spark lists
    them (query.py). At 100 TB the engine's own layout is the one that
    matters; converting at scan time keeps the driver's timestamp-typed
    testdata correct without forking the operators.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "timestamp_ntz":
        us = F.expr(ntz_epoch_us_expr("ts"))
        df = df.withColumn("ts", (us * F.lit(1000)).cast("long"))
    elif dtype == "timestamp":
        df = df.withColumn(
            "ts", (F.unix_micros(F.col("ts")) * F.lit(1000)).cast("long")
        )
    return df


def table_df(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    hit = _SCAN_CACHE.get(key)
    if hit is None:
        # misses are rare (one per session×table) — piggyback the purge
        # of dead sessions' pins here rather than on the hot hit path.
        # pop(k, None), never del: two concurrent misses both snapshot
        # the same dead entry and the second del would KeyError out of
        # the query (review r12 follow-up). The liveness probe is one
        # Py4J round trip, and entries share sessions (10 tables each):
        # memoize per SESSION within the sweep, or a near-cap cache pays
        # up to ~1024 gateway round trips on one miss (r14 review)
        alive_memo: dict[int, bool] = {}
        for k, (sess, _df) in list(_SCAN_CACHE.items()):
            sid = id(sess)
            alive = alive_memo.get(sid)
            if alive is None:
                alive = alive_memo[sid] = _session_alive(sess)
            if not alive:
                _SCAN_CACHE.pop(k, None)
        while len(_SCAN_CACHE) >= _SCAN_CACHE_CAP:
            try:
                _SCAN_CACHE.pop(next(iter(_SCAN_CACHE)), None)
            except (StopIteration, RuntimeError):
                break  # another thread emptied/mutated it — cap is met
        _ensure_read_confs(spark)
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = _normalize_event_time(df)
        hit = (spark, df)
        _SCAN_CACHE[key] = hit
    return hit[1]


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every test table as a DataFrame keyed by name."""
    return {t: table_df(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` resolves it.

    Idempotent; safe to call per query. Partition pruning / predicate
    pushdown still apply — the view is just a name for the scan.
    """
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
