"""Full-text search: inverted postings + BM25 ranking, Spark-first.

The reference ships DuckDB's `fts` extension installed but unused
(reference Dockerfile:11); this module provides the equivalent surface
as first-class DataFrame ops so a corpus-curation pipeline can do
keyword retrieval at 100 TB scale.

Scale design:

- **postings build** is the one heavy pass: docs are id-repartitioned
  BEFORE the token explode (the shingle_table lesson), so the per-doc
  term-frequency groupBy clusters on already-satisfied partitioning —
  the exploded token rows never shuffle; only compact (term, doc, tf)
  rows leave the stage.
- **the on-disk index** (`write_postings`) partitions by an md5 term
  bucket (`sampling.hash_mod` — reproducible driver-side, so the search
  path can name its buckets without a Spark job) and stores the corpus
  stats (N, avgdl, n_buckets) beside it, paid once at build time.
- **search** (`search_postings_index`) reads ONLY the query terms'
  buckets (partition pruning via an explicit `term_bucket IN` filter),
  never re-aggregates corpus stats, aggregates idf over matched terms
  only, and ranks via distributed TakeOrdered — a q-term query touches
  q/n_buckets of the index and nothing else. The in-memory
  `bm25_search` keeps the same scoring but derives stats from its
  postings frame (one aggregation — fine for a pinned index, wrong for
  per-query use over a 100 TB on-disk index; use the indexed path).

Scoring is classic BM25 (Robertson/Spärck Jones):
    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len_d/avg_len))
All arithmetic is double-precision JVM expressions — deterministic and
restatable in any engine (tests mirror it in DuckDB SQL verbatim).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quackpipe_spark.operators.dedup import tokenize
from quackpipe_spark.operators.sampling import hash_mod, hash_mod_py


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, id, tf) inverted postings plus per-doc length ``dl``.

    One exchange total (the id-repartition, data-sized — see
    dedup.shingle_table); the explode and the aggregate run
    exchange-free on top of it."""
    from quackpipe_spark.operators.util import sized_parts

    toks = (
        docs.repartition(sized_parts(docs, 1 << 20), F.col(id_col))
        .select(F.col(id_col), tokenize(F.col(text_col)).alias("_toks"))
        .select(id_col, F.size("_toks").alias("dl"), F.explode("_toks").alias("term"))
    )
    return toks.groupBy(id_col, "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )


def _is_local_path(path: str) -> bool:
    """The atomic-stats/marker/compaction machinery is os.*-based, so it
    only applies to local (or file:) index paths. Remote object-store
    indexes (s3a://, hdfs://) fall back to Spark-only I/O — weaker
    crash-atomicity (the object store's own semantics apply), but the
    index still works instead of writing a literal 's3a:' directory on
    the driver's local disk."""
    return "://" not in path or path.startswith("file:")


def _norm_index_path(path: str) -> str:
    """Strip a ``file:`` scheme down to the plain OS path — shared idiom
    in plans/index.py since r15 (the minhash-index append protocol needs
    the identical normalization; see norm_index_path's docstring)."""
    from quackpipe_spark.plans.index import norm_index_path

    return norm_index_path(path)


def _write_stats_atomic(path: str, n: int, avgdl: float, n_buckets: int) -> None:
    """Publish the corpus-stats row as ONE parquet file via tmp+rename —
    atomic at the file level, so a reader never sees a missing or
    half-written stats row (Spark's directory overwrite is
    delete-then-write and can crash into either). Any older stats files
    in the dir are swept after the new row is live. Local paths only
    (see _is_local_path)."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as papq

    d = f"{path}/stats"
    os.makedirs(d, exist_ok=True)
    t = pa.table(
        {
            "N": pa.array([int(n)], pa.int64()),
            "avgdl": pa.array([float(avgdl)], pa.float64()),
            "n_buckets": pa.array([int(n_buckets)], pa.int32()),
        }
    )
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    papq.write_table(t, tmp)
    try:
        fd = os.open(tmp, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    except OSError:
        pass
    os.replace(tmp, os.path.join(d, "stats.parquet"))
    # the rename is durable only once the STATS dir's entry is — without
    # this, a power loss could revert the stats row while the
    # applied-last marker (fsynced via the index ROOT dir, not stats/)
    # survives: postings hold the batch, stats stay the old N/avgdl, no
    # marker exists to trigger repair, and the replayed write_id skips
    # as already applied — silently wrong forever (review r14)
    _fsync_dir(d)
    for f in os.listdir(d):
        if f != "stats.parquet" and not f.startswith("."):
            os.unlink(os.path.join(d, f))


def _read_stats(spark, path: str):
    """Read the stats row, preferring the atomic stats.parquet when
    present (a legacy Spark-written stats dir mid-migration could
    briefly hold both)."""
    import os

    f = f"{path}/stats/stats.parquet"
    src = f if _is_local_path(path) and os.path.exists(f) else f"{path}/stats"
    return spark.read.parquet(src).collect()[0]


def _fsync_dir(path: str) -> None:
    """Best-effort directory fsync (shared helper in plans/index.py):
    a rename is durable only once its directory entry is — without this,
    a power loss could persist some published postings while losing the
    commit/applied markers, a state no recovery path detects."""
    from quackpipe_spark.plans.index import fsync_dir

    fsync_dir(path)


def _applied_last(path: str) -> str | None:
    """Shared applied-last protocol (plans/index.py since r15 — the
    minhash append journal uses the identical file and semantics)."""
    from quackpipe_spark.plans.index import read_applied_last

    return read_applied_last(path)


def _write_applied_last(path: str, write_id: str) -> None:
    from quackpipe_spark.plans.index import write_applied_last

    write_applied_last(path, write_id)


def _roll_forward_append(path: str, commit_path: str) -> None:
    """Complete a COMMITTED idempotent append (crashed or live): finish
    the staged-file moves (os.replace — idempotent per pair), overwrite
    the stats row with the marker's ABSOLUTE values (recorded at commit
    time, so re-running never double-applies a delta), record the
    write_id as applied, then drop the marker and stage remnants."""
    import json
    import os
    import shutil

    with open(commit_path) as f:
        meta = json.load(f)
    touched: set[str] = set()
    for src, dst in meta["moves"]:
        if os.path.exists(src):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(src, dst)
            touched.add(os.path.dirname(dst))
    for d in sorted(touched):
        _fsync_dir(d)  # publish renames durable BEFORE the marker flips
    if touched:
        # a BRAND-NEW bucket dir's own dentry lives in postings/ — fsync
        # the parent too, or a power loss could drop the whole bucket
        # while the applied marker survives (review r12 follow-up #2)
        _fsync_dir(os.path.join(path, "postings"))
    _write_stats_atomic(path, meta["new_n"], meta["new_avgdl"], meta["n_buckets"])
    _write_applied_last(path, meta["write_id"])
    os.unlink(commit_path)
    _fsync_dir(path)  # applied-last + marker unlink durable together
    shutil.rmtree(meta["stage"], ignore_errors=True)


def repair_postings_stats(spark, path: str) -> None:
    """Recompute the stats row from the postings (ground truth) and clear
    any append-pending markers — run automatically when append_postings
    finds a marker from a crashed predecessor, callable any time by the
    index's single writer."""
    import os

    path = _norm_index_path(path)
    post = spark.read.parquet(f"{path}/postings")
    # the id column is whatever the build used: the one column that isn't
    # part of the fixed postings shape
    id_col = next(
        c for c in post.columns if c not in ("term", "tf", "dl", "term_bucket")
    )
    st = (
        post.groupBy(id_col)
        .agg(F.first("dl").alias("dl"))
        .agg(F.count("*").alias("N"), F.avg("dl").alias("avgdl"))
        .collect()[0]
    )
    old = _read_stats(spark, path)
    _write_stats_atomic(
        path, int(st["N"]), float(st["avgdl"] or 1.0), int(old["n_buckets"])
    )
    for f in os.listdir(path):
        if f.startswith(".append-pending-"):
            os.unlink(os.path.join(path, f))


def write_postings(
    postings: DataFrame, path: str, n_buckets: int = 64, id_col: str = "doc_id"
) -> None:
    """Materialize the index: postings partitioned by md5 term bucket
    (a q-term query prunes to q directories) plus the corpus stats
    (N, avgdl, n_buckets) — computed ONCE here so no search ever pays a
    full-index aggregation for them. The stats aggregate reads the
    just-written compact parquet rather than re-running the postings
    lineage (a second explode over the raw corpus — the build must stay
    ONE heavy pass)."""
    path = _norm_index_path(path)
    spark = postings.sparkSession
    out = postings.withColumn("term_bucket", hash_mod(F.col("term"), n_buckets))
    # cluster by bucket before the partitioned write: one file per bucket
    # dir instead of one per (task × bucket) — a q-term probe then opens
    # q files, not q × cluster-width (r14; same fix as write_ivf_index)
    out.repartition("term_bucket").write.partitionBy("term_bucket").mode(
        "overwrite"
    ).parquet(f"{path}/postings")
    st = (
        spark.read.parquet(f"{path}/postings")
        .groupBy(id_col)
        .agg(F.first("dl").alias("dl"))
        .agg(F.count("*").alias("N"), F.avg("dl").alias("avgdl"))
        .collect()[0]
    )
    if _is_local_path(path):
        _write_stats_atomic(path, int(st["N"]), float(st["avgdl"] or 1.0), n_buckets)
    else:
        spark.createDataFrame(
            [(int(st["N"]), float(st["avgdl"] or 1.0), n_buckets)],
            "N BIGINT, avgdl DOUBLE, n_buckets INT",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def append_postings(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_over_files: int | None = 64,
    write_id: str | None = None,
) -> None:
    """Incrementally index a NEW batch into a written postings index —
    the FTS analogue of dedup.append_to_minhash_index: the standing index
    is never rebuilt or re-scanned for postings; only the batch pays the
    tokenize/explode pass, and its postings append into the same
    term-bucket partition layout.

    Corpus stats update INCREMENTALLY from the old stats row plus one
    small aggregation over the batch (N' = N + n; avgdl' =
    (N·avgdl + Σdl) / N') — never a full-index re-aggregation, so the
    append cost is O(batch) at any index size. Batch ids must be
    disjoint from the indexed corpus (same contract as the dedup index;
    re-indexing a doc would double-count it in df and stats).

    ``compact_over_files``: when any single bucket directory exceeds the
    bound after the append, the whole postings tree re-packs via the
    size-tiered planner (single-writer maintenance point, like the
    dedup-index auto-compact).

    ``write_id``: opt-in REPLAY IDEMPOTENCE for streaming callers (local
    paths only). With a unique id per logical batch, the append runs a
    stage→commit-marker→publish protocol: a crash at any point either
    leaves nothing visible (pre-commit — the replay re-runs cleanly) or
    rolls FORWARD at the next index access (post-commit — the replay
    sees the id applied and SKIPS), so a replayed micro-batch can never
    double-count tf/df/N/avgdl. Only the most recent id is remembered
    (Structured Streaming replays only the last uncommitted batch);
    passing a reused id for different data silently skips it — ids must
    be unique. Without write_id (batch callers), the original
    pending-marker protocol applies: a crash never corrupts stats
    (rebuilt from postings) but a replayed identical call appends again."""
    import os
    import shutil as _shutil
    import uuid as _uuid

    path = _norm_index_path(path)
    spark = docs.sparkSession
    local = _is_local_path(path)
    if local:
        # heal crashed COMPACTIONS at the next index access (not only the
        # next file-count-triggered compaction); then roll forward any
        # COMMITTED idempotent append a predecessor crashed mid-publish
        # (its marker carries absolute stats, so this is replay-safe),
        # sweep orphan pre-commit stage dirs, and finally: a pending
        # marker from a crashed predecessor means postings may include a
        # batch the stats row doesn't — rebuild stats from the postings
        # (ground truth) before trusting the incremental update
        from quackpipe_spark.plans.compactor import maybe_recover_parquet_dir

        for dirpath, _d, _f in os.walk(f"{path}/postings"):
            maybe_recover_parquet_dir(dirpath)
        for f in sorted(os.listdir(path)):
            if f.startswith(".append-commit-"):
                _roll_forward_append(path, os.path.join(path, f))
        for f in sorted(os.listdir(path)):
            if f.startswith(".append-stage-"):  # no commit marker → orphan
                _shutil.rmtree(os.path.join(path, f), ignore_errors=True)
        if any(f.startswith(".append-pending-") for f in os.listdir(path)):
            repair_postings_stats(spark, path)
    if write_id is not None and not local:
        # silently dropping the idempotence contract would re-introduce
        # the replay double-count this parameter exists to prevent — on
        # an object store the stage/commit protocol's renames don't
        # exist, so fail LOUDLY instead (review r12 follow-up)
        raise ValueError(
            "write_id replay idempotence requires a posix-rename filesystem "
            f"(local index path); got {path!r} — omit write_id (or pass "
            "replay_safe=False to postings_append_writer) to accept that "
            "replayed micro-batches double-count on this store"
        )
    if write_id is not None and _applied_last(path) == write_id:
        return  # replay of an already-applied batch
    st = _read_stats(spark, path)
    n_buckets = st["n_buckets"]
    if write_id is not None:
        _append_postings_idempotent(
            spark, docs, path, id_col, text_col, st, write_id
        )
        if compact_over_files is not None:
            _maybe_compact_postings(spark, path, compact_over_files)
        return
    marker = None
    if local:
        marker = os.path.join(path, f".append-pending-{_uuid.uuid4().hex}")
        with open(marker, "w"):
            pass
    # PIN the batch postings: the parquet append and the stats
    # aggregation are two actions over the same heavy tokenize/explode
    # lineage — unpinned, the batch pays it twice, and a source that is
    # nondeterministic between the two actions (a directory still being
    # written, a sampled frame) would write postings and stats from
    # DIFFERENT data, the exact drift the marker/repair machinery
    # exists to prevent
    post = build_postings(docs, id_col, text_col).persist()
    try:
        out = post.withColumn("term_bucket", hash_mod(F.col("term"), n_buckets))
        # cluster on the partition column first: one file per bucket per
        # append instead of tasks × buckets (the write_postings r14 fix —
        # an un-clustered append added up to `parallelism` files per
        # bucket per batch, re-growing the probe fan-in between
        # compactions)
        out.repartition("term_bucket").write.partitionBy("term_bucket").mode(
            "append"
        ).parquet(f"{path}/postings")
        b = (
            post.groupBy(id_col)
            .agg(F.first("dl").alias("dl"))
            .agg(F.count("*").alias("n"), F.sum("dl").alias("sum_dl"))
            .collect()[0]
        )
    finally:
        post.unpersist()
    n_new = int(b["n"] or 0)
    if n_new:
        new_n = int(st["N"]) + n_new
        new_avgdl = (int(st["N"]) * float(st["avgdl"]) + float(b["sum_dl"])) / new_n
        if local:
            _write_stats_atomic(path, new_n, new_avgdl, int(n_buckets))
        else:
            spark.createDataFrame(
                [(new_n, new_avgdl, int(n_buckets))],
                "N BIGINT, avgdl DOUBLE, n_buckets INT",
            ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    if marker is not None:
        os.unlink(marker)
    if compact_over_files is not None and local:
        _maybe_compact_postings(spark, path, compact_over_files)


def _maybe_compact_postings(spark, path: str, compact_over_files: int) -> None:
    import os

    root = f"{path}/postings"
    for _dirpath, _d, files in os.walk(root):
        n_files = sum(
            1
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
        if n_files > compact_over_files:
            compact_postings_index(spark, path)
            break


def _append_postings_idempotent(
    spark, docs: DataFrame, path: str, id_col: str, text_col: str, st, write_id: str
) -> None:
    """The write_id append protocol (local paths; see append_postings):
    stage the batch postings OUTSIDE the live tree, commit a marker that
    records the exact file moves and the ABSOLUTE post-append stats, then
    publish. Every step after the marker is idempotent, so a crash
    anywhere leaves the index recoverable to exactly-once semantics."""
    import glob as _glob
    import json as _json
    import os
    import shutil as _shutil
    import uuid as _uuid

    n_buckets = int(st["n_buckets"])
    stage = os.path.join(path, f".append-stage-{write_id}")
    _shutil.rmtree(stage, ignore_errors=True)
    post = build_postings(docs, id_col, text_col).persist()
    try:
        out = post.withColumn("term_bucket", hash_mod(F.col("term"), n_buckets))
        # one file per bucket per append (see append_postings — fewer
        # journaled moves and per-file fsyncs too)
        out.repartition("term_bucket").write.partitionBy("term_bucket").mode(
            "overwrite"
        ).parquet(stage)
        b = (
            post.groupBy(id_col)
            .agg(F.first("dl").alias("dl"))
            .agg(F.count("*").alias("n"), F.sum("dl").alias("sum_dl"))
            .collect()[0]
        )
    finally:
        post.unpersist()
    n_new = int(b["n"] or 0)
    if not n_new:
        # nothing to publish, but the batch IS applied: remember the id
        # so a replay of the same empty batch stays a no-op
        _shutil.rmtree(stage, ignore_errors=True)
        _write_applied_last(path, write_id)
        return
    new_n = int(st["N"]) + n_new
    new_avgdl = (int(st["N"]) * float(st["avgdl"]) + float(b["sum_dl"])) / new_n
    from quackpipe_spark.plans.compactor import _fsync_file

    moves = []
    for i, src in enumerate(
        sorted(_glob.glob(os.path.join(stage, "term_bucket=*", "*.parquet")))
    ):
        _fsync_file(src)  # staged DATA must be durable before the marker:
        # roll-forward must never publish a delayed-allocation-truncated
        # file (same reasoning as the compactor's journaled publish)
        bucket = os.path.basename(os.path.dirname(src))
        dst = os.path.join(
            path, "postings", bucket, f"append-{write_id}-{i}.parquet"
        )
        moves.append((src, dst))
    # the staged files' DENTRIES must be durable before the marker too:
    # roll-forward reads os.path.exists(src)==False as "already moved",
    # so a power loss that kept the marker but dropped the un-fsynced
    # stage dentries would skip every move yet still publish the
    # marker's stats — postings lost, stats overcounted, replay skipped
    # (review r14)
    for d in sorted({os.path.dirname(src) for src, _ in moves}):
        _fsync_dir(d)
    _fsync_dir(stage)
    commit = os.path.join(path, f".append-commit-{write_id}")
    tmp = commit + "." + _uuid.uuid4().hex
    with open(tmp, "w") as f:
        _json.dump(
            {
                "write_id": write_id,
                "stage": stage,
                "moves": moves,
                "new_n": new_n,
                "new_avgdl": new_avgdl,
                "n_buckets": n_buckets,
            },
            f,
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, commit)
    _fsync_dir(path)  # the COMMIT POINT: marker entry durable before publish
    _roll_forward_append(path, commit)


def load_postings(spark, path: str) -> DataFrame:
    """Reopen the postings table (all buckets — for re-aggregation or
    in-memory pinning; the per-query path is search_postings_index)."""
    return spark.read.parquet(f"{_norm_index_path(path)}/postings").drop("term_bucket")


def compact_postings_index(spark, path: str) -> list[str]:
    """Re-pack each term_bucket directory of a postings index with the
    size-tiered greedy planner (plans.compactor) — repeated builds or
    future appends leave multiple file-groups per bucket and the
    partition-pruned search then opens many small files per probed
    bucket. Merged outputs sort by term so row-group min/max stats prune
    within a bucket too. Single-writer maintenance op (see
    compact_parquet_dir's concurrency contract); search results are
    unchanged — same rows, fewer files."""
    from quackpipe_spark.plans.compactor import compact_parquet_tree

    return compact_parquet_tree(
        spark, f"{_norm_index_path(path)}/postings", order_by=["term"]
    )


def _terms(query: str) -> list[str]:
    # driver-side tokenization MUST mirror dedup.tokenize (trim+lower+\s+)
    # so a query term matches the postings' term domain exactly
    # re.ASCII: Java's \s is ASCII-only, so a Unicode space (NBSP etc.)
    # is TERM TEXT in the index — a Unicode-aware split here would break
    # the query term apart and probe the wrong buckets (silent zero
    # hits); stateful.py's tokenizer mirror pins the same flag
    terms = sorted(
        {t for t in re.split(r"\s+", query.strip(" ").lower(), flags=re.ASCII) if t}
    )
    if not terms:
        raise ValueError("empty query")
    return terms


def _bm25_rank(
    matched: DataFrame,
    id_col: str,
    n_docs: int,
    avgdl: float,
    topk: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Score matched postings and return (id, rank, score) — document
    frequencies aggregate over just the matched terms' rows. Ranking
    orders by the UNROUNDED score (rounding only the displayed value):
    ordering by a rounded score would re-rank near-boundary pairs by the
    id tie-break, diverging from any oracle that orders raw scores."""
    dfreq = matched.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf = F.col("tf").cast("double")
    denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    contrib = idf * tf * (k1 + 1.0) / denom
    scored = (
        matched.join(F.broadcast(dfreq), "term")
        .select(F.col(id_col), contrib.alias("_c"))
        .groupBy(id_col)
        .agg(F.sum("_c").alias("_score"))
    )
    # distributed top-k first (TakeOrderedAndProject — no global window over
    # the full candidate set), then rank the ≤topk survivors
    top = scored.orderBy(F.desc("_score"), F.asc(id_col)).limit(topk)
    w = Window.orderBy(F.desc("_score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rank", F.round("_score", 6).alias("score")
    )


def bm25_search(
    postings: DataFrame,
    query: str,
    id_col: str = "doc_id",
    topk: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k docs for a keyword query over an in-memory postings frame.

    Corpus stats aggregate over the postings' per-doc rows each call —
    acceptable for a pinned/cached index; for a materialized 100 TB
    index use :func:`search_postings_index`, which reads stats from the
    build artifact and prunes to the query terms' buckets."""
    terms = _terms(query)
    stats = postings.select(id_col, "dl").groupBy(id_col).agg(F.first("dl").alias("dl"))
    g = stats.agg(F.count("*").alias("N"), F.avg("dl").alias("avgdl")).collect()[0]
    matched = postings.filter(F.col("term").isin(terms))
    return _bm25_rank(
        matched, id_col, g["N"], float(g["avgdl"] or 1.0), topk, k1, b
    )


def bm25_scan(
    docs: DataFrame,
    query: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Ad-hoc BM25 over RAW docs — no postings build, no index, ONE action.

    For a q-term query, per-doc term frequencies are row-local:
    tf(t) = size(filter(tokens, x -> x = t)), one array scan per term
    inside whole-stage codegen. The corpus never explodes, nothing wide
    shuffles, and there is no per-doc groupBy — scoring is a row-local
    expression once the 1-row stats frame (N, avgdl, per-term df, all
    from one aggregation) broadcasts back. Compare: routing an ad-hoc
    query through ``build_postings`` moves O(corpus tokens) rows through
    a groupBy for information the scan already holds per row. For a
    standing index over a 100 TB corpus, build `write_postings` once and
    use `search_postings_index` instead.

    Scores are deterministic by construction (fixed term-sorted addition
    order — see the inline note), unlike the unordered F.sum path in
    `_bm25_rank`.

    The tokenized array is bound behind a Filter barrier so the split
    runs once per row (CollapseProject would otherwise inline it into
    every per-term lambda; higher-order functions are excluded from
    codegen subexpression elimination)."""
    terms = _terms(query)
    # id-repartition before tokenizing (the shingle_table lesson): a
    # small/compact parquet source arrives as one scan split, which would
    # single-thread the tokenization. The null filter is on RAW text (not
    # the tokenized array — same rows: split/trim/lower are null-in
    # null-out) so the scan-side pushed filter stays a cheap null check
    # instead of evaluating the split. The exchange is ALSO the
    # ReuseExchange point both DAG branches share (stats agg + probe
    # side), so it must stay even when tiny — but its partition COUNT
    # follows the data (see dedup.shingle_table), not the core count.
    from quackpipe_spark.operators.util import sized_parts

    rep = docs.filter(F.col(text_col).isNotNull()).repartition(
        sized_parts(docs, 1 << 20), F.col(id_col)
    )
    toks = rep.select(F.col(id_col), tokenize(F.col(text_col)).alias("_toks"))

    def _tf(term: str):
        # single-arg lambda via closure: a 2-arg lambda would make PySpark
        # pass the ELEMENT INDEX as the second argument
        return F.size(F.filter("_toks", lambda x: x == F.lit(term)))

    proj = toks.select(
        F.col(id_col),
        F.size("_toks").alias("dl"),
        *[_tf(t).alias(f"_tf{i}") for i, t in enumerate(terms)],
    )
    # corpus stats AND per-term document frequencies in ONE aggregation
    # (df(t) = count of docs with tf>0), joined back as a broadcast 1-row
    # frame: the whole query is a single action, and both DAG branches sit
    # on the same repartition exchange, which ReuseExchange dedupes — the
    # scan runs once
    stats = proj.agg(
        F.count("*").alias("_N"),
        F.coalesce(F.avg("dl"), F.lit(1.0)).alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    j = proj.crossJoin(F.broadcast(stats))
    # per-doc score as a FIXED-ORDER sum of per-term contributions, terms
    # sorted ascending — identical to a sequential fold over term-sorted
    # matched contributions (absent terms add exact 0.0, and idf > 0 rules
    # out -0.0), so this row-local form is deterministic by construction
    # and bit-equal to the oracle's ordered list_reduce
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        df = F.col(f"_df{i}")
        idf = F.log(
            1.0 + (F.col("_N").cast("double") - df + 0.5) / (df + 0.5)
        )
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl"))
        score = score + F.when(
            F.col(f"_tf{i}") > 0, idf * tf * (k1 + 1.0) / denom
        ).otherwise(F.lit(0.0))
    # match filter as score > 0 (every contribution is strictly positive:
    # idf > 0 whenever df ≤ N, tf > 0 for present terms — so score > 0 ⟺
    # ≥1 query term present). Deliberately NOT a greatest(tf…)>0 predicate
    # on the doc side: that pushes through the exchange into the scan and
    # serializes the tokenization onto the (possibly single) scan split,
    # while a predicate over both join sides stays above the broadcast
    # join, post-exchange, fully parallel.
    # rank by the UNROUNDED score (round only the displayed value) — the
    # oracle's top-k CTE orders raw scores, so rounding before the sort
    # would let the id tie-break re-rank near-boundary pairs
    scored = j.filter(score > 0).select(F.col(id_col), score.alias("_score"))
    top = scored.orderBy(F.desc("_score"), F.asc(id_col)).limit(topk)
    w = Window.orderBy(F.desc("_score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rank", F.round("_score", 6).alias("score")
    )


def search_postings_index(
    spark,
    path: str,
    query: str,
    id_col: str = "doc_id",
    topk: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Search a written index the scale-correct way: corpus stats come
    from the build artifact (no full-index aggregation), and the scan is
    pre-filtered to the query terms' md5 buckets — partition pruning
    reads ≤ q of n_buckets directories for a q-term query."""
    import os

    path = _norm_index_path(path)
    terms = _terms(query)

    def _pending() -> bool:
        # .append-commit- counts too: during an idempotent publish the
        # postings can briefly include a batch the stats row doesn't
        return _is_local_path(path) and any(
            f.startswith((".append-pending-", ".append-commit-"))
            for f in os.listdir(path)
        )

    # marker check BRACKETS the stats read: a crashed append's marker is
    # persistent so either check sees it; a LIVE append that completes
    # entirely on one side of the read is consistent (fresh stats + fresh
    # postings, or neither); one in flight during the read shows its
    # marker to at least one check. (Markers give crash DURABILITY, not
    # snapshot isolation — a reader overlapping a live appender can see a
    # torn batch in the postings scan regardless; the guarantee is that
    # stats and postings never remain inconsistent once writes quiesce.)
    pending = _pending()
    st = _read_stats(spark, path)
    pending = pending or _pending()
    n_docs, avgdl = int(st["N"]), float(st["avgdl"])
    if pending:
        # a pending marker means the postings may include a batch the
        # stats row doesn't (crashed append — or one in flight). A
        # reader must NOT run repair_postings_stats: rewriting the stats
        # row and deleting the marker races a LIVE appender and could
        # erase the crash signal its successor relies on. Instead score
        # THIS query with fresh stats aggregated read-only from the
        # postings (ground truth) — costs one postings aggregation only
        # while a marker is present, leaves healing to the writer.
        post = spark.read.parquet(f"{path}/postings")
        doc_col = next(
            c for c in post.columns if c not in ("term", "tf", "dl", "term_bucket")
        )
        fresh = (
            post.groupBy(doc_col)
            .agg(F.first("dl").alias("dl"))
            .agg(F.count("*").alias("N"), F.avg("dl").alias("avgdl"))
            .collect()[0]
        )
        n_docs, avgdl = int(fresh["N"]), float(fresh["avgdl"] or 1.0)
    buckets = sorted({hash_mod_py(t, st["n_buckets"]) for t in terms})
    if _is_local_path(path):
        # heal a crashed compaction in the buckets this query will read
        # — one listdir per probed bucket when there is nothing to do
        # (recovery never touches the stats row, so the read above stays
        # valid; NB: loop var must not shadow the BM25 ``b`` parameter)
        from quackpipe_spark.plans.compactor import maybe_recover_parquet_dir

        for _bucket in buckets:
            maybe_recover_parquet_dir(f"{path}/postings/term_bucket={_bucket}")
    matched = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
        .drop("term_bucket")
    )
    return _bm25_rank(matched, id_col, n_docs, avgdl, topk, k1, b)
