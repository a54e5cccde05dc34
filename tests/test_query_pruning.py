"""Time-range extraction + partition pruning on written tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackpipe_spark.query import extract_time_bounds

NS = 10**9


def test_extract_literal_bounds():
    assert extract_time_bounds("SELECT * FROM t WHERE __timestamp >= 100 AND __timestamp < 200") == (100, 200)
    assert extract_time_bounds("WHERE __timestamp BETWEEN 5 AND 9") == (5, 9)
    assert extract_time_bounds("SELECT 1") == (None, None)


def test_extract_epoch_ns_idiom():
    # README.md:121 documented form
    lo, hi = extract_time_bounds(
        "SELECT * FROM weather WHERE __timestamp >= epoch_ns('2024-01-05 00:00:00'::TIMESTAMP) "
        "AND __timestamp < epoch_ns(TIMESTAMP '2024-01-06 12:30:00')"
    )
    assert lo == 1704412800 * NS  # 2024-01-05 00:00:00 UTC
    assert hi == 1704544200 * NS  # 2024-01-06 12:30:00 UTC


def test_partition_filter_pushdown_on_written_table(spark, tmp_path):
    """date/hour filters on the ingested store prune hive partitions."""
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.ingest import IngestService
    from quackpipe_spark.query import QueryEngine

    catalog = Catalog(str(tmp_path / "root"))
    svc = IngestService(spark, catalog, save_timeout_s=3600)
    t0 = 1_700_000_000 * NS
    svc.store("d", "pp", {"v": [1], "__timestamp": [t0]})
    svc.store("d", "pp", {"v": [2], "__timestamp": [t0 + 86_400 * NS]})
    svc.flush()
    qe = QueryEngine(spark, catalog)
    df = qe.table_df(catalog.get("d", "pp")).filter(F.col("date") == "2023-11-14")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "2023-11-14" in plan
    assert df.count() == 1

    # index-level pruning via __timestamp bounds selects one file
    files_all = qe.table_files(catalog.get("d", "pp"))
    files_pruned = qe.table_files(catalog.get("d", "pp"), lo=t0 + 86_000 * NS)
    assert len(files_all) == 2 and len(files_pruned) == 1


def test_read_parquet_array_form(spark, tmp_path):
    """The reference's read_parquet(ARRAY[...]) multi-file scan."""
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.query import QueryEngine

    qe = QueryEngine(spark, Catalog(str(tmp_path / "root")))
    f1 = "/root/testdata/sf0.001/region.parquet"
    f2 = "/root/testdata/sf0.001/region.parquet"
    df = qe.sql(f"SELECT count() AS n FROM read_parquet(ARRAY['{f1}', '{f2}'])")
    assert df.collect()[0]["n"] == 10  # both files scanned


def test_query_http_dialect(spark, tmp_path):
    """ClickHouse dialect through the HTTP /query endpoint."""
    import json
    import urllib.request

    from quackpipe_spark.api import GigapiServer

    srv = GigapiServer(spark, str(tmp_path / "root"), port=0)
    srv.start()
    base = f"http://127.0.0.1:{srv._httpd.server_address[1]}"
    try:
        body = (
            b'weather,location=east temperature=70 1717405200\n'
            b'weather,location=east temperature=80 1717405260\n'
        )
        req = urllib.request.Request(
            base + "/write?db=d&precision=s", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 204
        q = {
            "query": "SELECT location, count() AS n, toInt64(round(avg(temperature))) AS t,"
            " toStartOfMinute(from_epoch_ns(min(time))) AS m FROM weather GROUP BY location"
        }
        req = urllib.request.Request(
            base + "/query?db=d", data=json.dumps(q).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            [row] = json.loads(r.read())["results"]
        assert row["location"] == "east" and row["n"] == 2 and row["t"] == 75
        assert row["m"].startswith("2024-06-03")
    finally:
        srv.stop()


def test_read_parquet_options_forms(spark, tmp_path):
    """read_parquet('path', union_by_name=…, hive_partitioning=…,
    filename=…) — the reference's own scan idiom
    (merge_service_fs.go:215 uses the ARRAY form with both options)."""
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.query import QueryEngine

    # two schema generations in one directory → union_by_name territory
    d = tmp_path / "store"
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        str(d / "g1.parquet")
    )
    spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double").write.parquet(
        str(d / "g2.parquet")
    )
    qe = QueryEngine(spark, Catalog(str(tmp_path / "root")))

    df = qe.sql(
        f"SELECT id, name, score FROM read_parquet('{d}/*', union_by_name = true) ORDER BY id"
    )
    rows = df.collect()
    assert [r["id"] for r in rows] == [1, 2]
    assert rows[0]["score"] is None and rows[1]["score"] == 9.5

    # ARRAY form with the reference's exact option spelling
    f1, f2 = str(d / "g1.parquet"), str(d / "g2.parquet")
    df = qe.sql(
        "SELECT count() AS n FROM read_parquet("
        f"ARRAY['{f1}', '{f2}'], hive_partitioning = false, union_by_name = true)"
    )
    assert df.collect()[0]["n"] == 2

    # filename=true projects the source file (DuckDB semantics)
    df = qe.sql(
        f"SELECT DISTINCT filename FROM read_parquet('{f1}', filename = true)"
    )
    assert all("g1.parquet" in r["filename"] for r in df.collect())


def test_rewrite_sql_tolerates_options():
    """The engine-less rewriter must not choke on the options tail."""
    from quackpipe_spark.functions.dialect import rewrite_sql

    out = rewrite_sql(
        "SELECT count() FROM read_parquet('/x/y.parquet', union_by_name = true)"
    )
    assert out == "SELECT count(*) FROM parquet.`/x/y.parquet`"


def test_bounds_disabled_for_non_conjunctive_contexts():
    """Constructs under which an ANDed bound silently loses rows must
    disable pruning entirely: set ops across SELECT scopes, NOT(...)
    negation, CASE expressions, and subqueries."""
    assert extract_time_bounds(
        "SELECT * FROM t WHERE __timestamp < 100 "
        "UNION ALL SELECT * FROM t WHERE __timestamp >= 200"
    ) == (None, None)
    assert extract_time_bounds(
        "SELECT * FROM t WHERE NOT (__timestamp >= 1000)"
    ) == (None, None)
    assert extract_time_bounds(
        "SELECT CASE WHEN __timestamp >= 50 THEN 'new' ELSE 'old' END FROM t"
    ) == (None, None)
    assert extract_time_bounds(
        "SELECT * FROM t WHERE a IN (SELECT a FROM u WHERE __timestamp > 7)"
    ) == (None, None)
    # plain IS NOT NULL must NOT disable pruning (NOT without a group)
    assert extract_time_bounds(
        "SELECT * FROM t WHERE a IS NOT NULL AND __timestamp >= 100"
    ) == (100, None)


def test_parenless_not_disables_pruning(spark, tmp_path):
    """NOT binds looser than a comparison: 'NOT __timestamp >= x' inverts
    the bound without parentheses, so any NOT (except IS NOT NULL /
    IS NOT DISTINCT) must disable pruning — applying the bound as a
    positive prune silently drops exactly the rows the query wants."""
    from quackpipe_spark.query import extract_time_bounds

    assert extract_time_bounds(
        "SELECT * FROM t WHERE NOT __timestamp >= 1000"
    ) == (None, None)
    assert extract_time_bounds(
        "SELECT * FROM t WHERE NOT __timestamp BETWEEN 5 AND 9"
    ) == (None, None)
    # the safe forms still prune
    assert extract_time_bounds(
        "SELECT * FROM t WHERE __timestamp >= 1000 AND v IS NOT NULL"
    )[0] == 1000
    assert extract_time_bounds(
        "SELECT * FROM t WHERE __timestamp >= 7 AND a IS NOT DISTINCT FROM b"
    )[0] == 7


def test_mixed_case_table_reference_reregisters_view(spark, tmp_path):
    """Spark resolves view names case-insensitively; the engine's
    table-reference scan must agree, or 'FROM Weather' reuses a stale
    pruned view registered by an earlier 'FROM weather' query."""
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.query import QueryEngine
    from quackpipe_spark.writer import HiveWriter

    cat = Catalog(str(tmp_path / "root"))
    w = HiveWriter(spark, cat)
    w.write_columnar(
        "db", "weather", {"__timestamp": [1_000, 2_000], "v": [1, 2]}
    )
    qe = QueryEngine(spark, cat)
    # prune-registering query first
    assert qe.sql(
        "SELECT count(*) AS n FROM weather WHERE __timestamp >= 2000", db="db"
    ).collect()[0]["n"] == 1
    # mixed-case follow-up must see the FULL table, not the pruned view
    assert qe.sql("SELECT count(*) AS n FROM Weather", db="db").collect()[0]["n"] == 2


def test_per_table_bounds_qualified_join():
    from quackpipe_spark.query import extract_time_bounds_per_table as ex

    q = (
        "SELECT a.v, b.v FROM ta a JOIN tb b ON a.v = b.v "
        "WHERE a.__timestamp >= 100 AND a.__timestamp < 200 "
        "AND b.__timestamp BETWEEN 50 AND 80"
    )
    assert ex(q, ["ta", "tb"]) == {"ta": (100, 200), "tb": (50, 80)}
    # unaliased relations resolve by their own (last-segment) name
    q2 = (
        "SELECT * FROM db.ta JOIN tb ON ta.v = tb.v "
        "WHERE ta.__timestamp >= 7 AND tb.__timestamp < 9"
    )
    assert ex(q2, ["ta", "tb"]) == {"ta": (7, None), "tb": (None, 9)}
    # unqualified bound in a join is unattributable — no pruning
    assert ex("SELECT * FROM ta JOIN tb ON ta.v=tb.v WHERE __timestamp >= 5", ["ta", "tb"]) == {}
    # unknown / unresolvable qualifier: that bound is skipped, others kept
    assert ex(
        "SELECT * FROM ta a JOIN tb b ON a.v=b.v WHERE zz.__timestamp >= 5 AND a.__timestamp >= 3",
        ["ta", "tb"],
    ) == {"ta": (3, None)}


def test_per_table_bounds_alias_shadowing_and_ambiguity():
    from quackpipe_spark.query import extract_time_bounds_per_table as ex

    # an alias that equals ANOTHER table's name must win over the bare
    # table (standard SQL: aliased relations are addressable only by
    # alias) — here `tb` names the ta relation
    q = "SELECT * FROM ta tb JOIN tb x ON tb.v = x.v WHERE tb.__timestamp >= 5"
    assert ex(q, ["ta", "tb"]) == {"ta": (5, None)}
    # a name claimed by two different tables is ambiguous → dropped
    q2 = "SELECT * FROM ta x JOIN tb x ON 1=1 WHERE x.__timestamp >= 5"
    assert ex(q2, ["ta", "tb"]) == {}


def test_per_table_bounds_outer_join_scoping():
    from quackpipe_spark.query import extract_time_bounds_per_table as ex

    # ON-clause bound on the PRESERVED side of a LEFT JOIN does not
    # filter its rows — must not prune
    q = "SELECT * FROM ta a LEFT JOIN tb b ON a.v = b.v AND a.__timestamp >= 100"
    assert ex(q, ["ta", "tb"]) == {}
    # ...but a WHERE bound stays safe under any join flavor
    q2 = (
        "SELECT * FROM ta a LEFT JOIN tb b ON a.v = b.v "
        "WHERE a.__timestamp >= 100 AND b.__timestamp < 50"
    )
    assert ex(q2, ["ta", "tb"]) == {"ta": (100, None), "tb": (None, 50)}
    # unqualified single-table: an ON bound under LEFT JOIN is likewise
    # ignored (the old single-table path would have mis-pruned here)
    q3 = "SELECT * FROM ta LEFT JOIN _rp_x ON __timestamp >= 100"
    assert ex(q3, ["ta"]) == {}


def test_join_query_prunes_both_tables_files(spark, tmp_path):
    """End-to-end: a two-big-table join with qualified __timestamp bounds
    reads only the overlapping files of EACH side, and returns the same
    rows as the unpruned plan."""
    from quackpipe_spark.catalog import Catalog
    from quackpipe_spark.ingest import IngestService
    from quackpipe_spark.query import QueryEngine

    catalog = Catalog(str(tmp_path / "root"))
    svc = IngestService(spark, catalog, save_timeout_s=3600)
    t0 = 1_700_000_000 * NS
    day = 86_400 * NS
    # two files per table: day-0 and day-1
    for tbl in ("pa", "pb"):
        svc.store("d", tbl, {"v": [1, 2], "__timestamp": [t0, t0 + 1]})
        svc.store("d", tbl, {"v": [2, 3], "__timestamp": [t0 + day, t0 + day + 1]})
    svc.flush()
    qe = QueryEngine(spark, catalog)
    assert len(qe.table_files(catalog.get("d", "pa"))) == 2
    q = (
        "SELECT a.v AS v FROM pa a JOIN pb b ON a.v = b.v "
        f"WHERE a.__timestamp >= {t0 + day} AND b.__timestamp >= {t0 + day}"
    )
    df = qe.sql(q, db="d")
    pruned_inputs = df.inputFiles()
    assert len(pruned_inputs) == 2  # one file per side, not 2+2
    got = sorted(r["v"] for r in df.collect())
    # unpruned truth: same query with bounds the pruner cannot use
    full = qe.sql(
        "SELECT a.v AS v FROM pa a JOIN pb b ON a.v = b.v "
        f"WHERE a.__timestamp + 0 >= {t0 + day} AND b.__timestamp + 0 >= {t0 + day}",
        db="d",
    )
    assert len(full.inputFiles()) == 4
    assert got == sorted(r["v"] for r in full.collect())


def test_self_join_never_prunes():
    """Both aliases of a self-joined table read the SAME registered view,
    so per-alias bounds must not prune it: a one-sided bound would drop
    the other alias's rows, and conflicting per-alias bounds would
    intersect to an empty range that prunes every file."""
    from quackpipe_spark.query import extract_time_bounds_per_table

    # one-sided qualified bound on a self-join: no pruning
    assert extract_time_bounds_per_table(
        "SELECT a.v, b.v FROM events a JOIN events b ON a.k = b.k "
        "WHERE a.__timestamp >= 100",
        ["events"],
    ) == {}
    # conflicting per-alias bounds (recent vs historical self-join):
    # must NOT intersect to the impossible (200, 100)
    assert extract_time_bounds_per_table(
        "SELECT * FROM events a JOIN events b ON a.k = b.k "
        "WHERE a.__timestamp >= 200 AND b.__timestamp < 100",
        ["events"],
    ) == {}
    # unqualified bound with the table referenced twice: also skipped
    assert extract_time_bounds_per_table(
        "SELECT * FROM events a JOIN events b USING (k) WHERE __timestamp >= 100",
        ["events"],
    ) == {}
    # a distinct second table in the same query still prunes normally
    assert extract_time_bounds_per_table(
        "SELECT * FROM events a JOIN events b ON a.k = b.k "
        "JOIN ticks t ON t.k = a.k "
        "WHERE a.__timestamp >= 100 AND t.__timestamp >= 7",
        ["events", "ticks"],
    ) == {"ticks": (7, None)}


def test_comma_join_disables_pruning():
    """Legacy comma-join relations aren't captured by the FROM/JOIN
    relation scan, so a comma SELF-join would evade the referenced-twice
    guard — a qualified bound on one alias would prune files the comma
    alias still reads (silent missing rows). Any top-level comma in a
    FROM scope therefore disables pruning outright."""
    from quackpipe_spark.query import extract_time_bounds_per_table

    # the motivating bug: comma self-join + one-sided qualified bound
    assert extract_time_bounds_per_table(
        "SELECT * FROM events e, events e2 "
        "WHERE e.__timestamp >= 123 AND e.k = e2.k",
        ["events"],
    ) == {}
    # comma-join over two distinct tables: also conservative (the comma
    # relation is invisible to the alias map, so nothing is attributable)
    assert extract_time_bounds_per_table(
        "SELECT * FROM events e, ticks t "
        "WHERE e.__timestamp >= 5 AND e.k = t.k",
        ["events", "ticks"],
    ) == {}
    # mixed JOIN ... ON cond, tbl — the comma hides after the ON clause
    assert extract_time_bounds_per_table(
        "SELECT * FROM ticks a JOIN ticks2 b ON a.x = b.x, events e2 "
        "WHERE a.__timestamp >= 5",
        ["ticks", "ticks2", "events"],
    ) == {}
    # non-FROM commas must NOT disable pruning: SELECT list, EXTRACT's
    # internal FROM, function args, GROUP BY lists
    assert extract_time_bounds_per_table(
        "SELECT EXTRACT(MONTH FROM ts), coalesce(a, b) FROM events "
        "WHERE __timestamp >= 1 GROUP BY a, b",
        ["events"],
    ) == {"events": (1, None)}
