"""Physical-plan assertions: the scale contracts (.explain discipline).

These pin the plan shapes that make queries survive 100 TB: predicate
pushdown reaching the scan, column pruning, broadcast joins for dims,
the top-K rewrite, and partial aggregation — regressions here are silent
at test scale and catastrophic at cluster scale."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from tests.conftest import SF_DIR

from quackpipe_spark.workloads import sql_surface as S


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_pushdown_and_pruning(spark):
    p = plan_text(S.QUERIES["q6_forecast_revenue"](spark, SF_DIR))
    assert "PushedFilters:" in p
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_quantity" in p
    # column pruning: only the 4 needed columns in ReadSchema
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" in read_schema and "l_orderkey" not in read_schema
    assert "l_returnflag" not in read_schema


def test_q3_broadcast_and_topk(spark):
    p = plan_text(S.QUERIES["q3_shipping_priority"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p  # dims must broadcast at this scale


def test_q1_partial_aggregation(spark):
    p = plan_text(S.QUERIES["q1_pricing_summary"](spark, SF_DIR))
    # partial + final HashAggregate pair (map-side combine)
    assert p.count("HashAggregate") >= 2


def test_topk_rewrite(spark):
    p = plan_text(S.topk_orders(spark, SF_DIR))
    assert "TakeOrderedAndProject" in p
    assert "GlobalLimit" not in p  # rewritten, not sort-then-limit


def test_semi_anti_join_physical(spark):
    p = plan_text(S.join_semi_anti(spark, SF_DIR))
    assert "LeftSemi" in p and "LeftAnti" in p


def test_scan_reuse_cache(spark):
    """table_df returns the same DataFrame per (session, dir, table)."""
    from quackpipe_spark.sources.tables import table_df

    a = table_df(spark, SF_DIR, "lineitem")
    b = table_df(spark, SF_DIR, "lineitem")
    assert a is b


def test_blocked_near_pairs_single_pass_no_selfjoin(spark, monkeypatch):
    """Pair scoring must be linear data movement, never a self-join whose
    interpreted per-pair fold and double-computed subtree were the old
    plan's cost. Two physical shapes, both pinned: the tiny-input FUSED
    path is one MapInArrow with ZERO exchanges (assignment and scoring in
    the same kernel); the distributed path is exactly one shuffle (the
    cell groupBy) feeding one grouped-Arrow stage."""
    from quackpipe_spark.operators import similarity as S2

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pairs = S2.blocked_near_pairs(emb, threshold=0.40, n_cells=8, probes=2)
    p = plan_text(pairs)
    assert "MapInArrow" in p
    assert "Exchange" not in p, "fused path must not shuffle"
    assert "Join" not in p, "pair scoring must not self-join the assignment"

    monkeypatch.setattr(S2, "plan_size_bytes", lambda df: 1 << 40)
    pairs_d = S2.blocked_near_pairs(emb, threshold=0.40, n_cells=8, probes=2)
    pd_ = plan_text(pairs_d)
    assert "FlatMapGroupsInArrow" in pd_ or "FlatMapGroupsInPandas" in pd_

    def op_ids(plan: str, name: str) -> set:
        import re as _re

        return set(_re.findall(r"\((\d+)\) " + name + r"\b", plan))

    assert len(op_ids(pd_, "Exchange")) == 1, "one cell shuffle only"
    # the assignment UDF must run ONCE per row — a deterministic UDF
    # under explode's implicit size filter gets collapsed into two
    # ArrowEvalPython stages (the asNondeterministic marker pins this)
    assert len(op_ids(pd_, "ArrowEvalPython")) == 1
    assert "Join" not in pd_


def test_jaccard_verify_shingles_candidates_only(spark):
    """Verify work must be proportional to the CANDIDATE set: the semi-join
    against candidate ids must land on the docs scan BEFORE the shingle
    explode (a full-corpus re-explode doubles the heaviest stage at scale),
    and |A∩B| must be one array_intersect per pair, not a pair×shingle
    join."""
    from quackpipe_spark.operators import dedup as D

    # pin the COLD plan: persisted fragments from earlier tests otherwise
    # substitute as InMemoryTableScan, whose cached-plan detail text
    # carries extra Exchange/Aggregate lines
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = docs.limit(2).select(
        (docs.doc_id * 0).alias("a"), (docs.doc_id * 0 + 1).alias("b")
    ).distinct()
    p = plan_text(D.jaccard_verify(docs, pairs))
    assert "array_intersect" in p
    # the explode (Generate) must sit ABOVE the semi-join so it consumes
    # already-filtered docs — formatted explain numbers operators bottom-up
    # (leaves smallest), so every Generate's id must exceed the lowest
    # semi-join id; a regression to explode-then-filter puts the Generate
    # below the join and flips the inequality
    lines = p.splitlines()
    gen_ids = [int(l.split("(")[1].split(")")[0]) for l in lines if "Generate" in l and "(" in l]
    semi_ids = [int(l.split("(")[1].split(")")[0]) for l in lines
                if "Join" in l and "LeftSemi" in l and "(" in l]
    assert gen_ids and semi_ids
    assert min(gen_ids) > min(semi_ids), "explode must consume semi-joined docs"


def test_lsh_candidates_single_signature_pipeline(spark):
    """The LSH candidate stage must compute the shingle-explode + k-md5
    signature pipeline exactly ONCE (r15 rewrite): candidates come from
    one (band, bh) bucket collect with pair emission from the sorted id
    array, not from a banded SELF-join. The self-join consumed the banded
    table on both sides, and because the signature aggregate is
    exchange-free (pre-partitioned by id) nothing was reusable between
    the sides — the whole corpus-wide hashing ran twice per candidate
    job (r15 plan audit)."""
    import re

    from quackpipe_spark.operators import dedup as D

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = D.minhash_signatures(docs, num_hashes=12)
    p = plan_text(D.lsh_candidates(sigs, num_hashes=12, bands=4))
    assert "Join" not in p, "candidates must not self-join the banded table"
    # exactly one scan and one shingle/band pipeline: Generates are the
    # shingle explode, the band posexplode, and the two chunked
    # pair-emission generates (r16: posexplode member index, then the
    # per-member tail slice — bounds every physical row to O(m) for an
    # m-member bucket instead of one m·(m-1)/2-struct row) — a
    # duplicated pipeline would double the lower two
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert len(re.findall(r"\(\d+\) Generate", p)) == 4
    # the single-row quadratic flatten must not come back: no Generate
    # argument may flatten a nested per-member transform
    gen_args = [l for l in p.splitlines() if "explode(flatten(transform(" in l]
    assert not gen_args, "pair emission regressed to single-row flatten"
    # exchanges: at most the doc repartition, the (band, bh) bucket
    # shuffle, and the pair distinct — at this test's corpus size the
    # data-sized doc exchange (r16) is a single partition, which
    # satisfies every downstream clustering outright, so the latter two
    # collapse away; a duplicated pipeline would ADD exchanges (and a
    # second Scan, pinned above)
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 3


def test_simhash_per_row_no_explode_no_shuffle(spark):
    """The simhash signature is per-row state: the plan must contain NO
    Generate (token explode) and NO aggregation — one projection with the
    fold. (The old explode+groupBy paid a full token-row shuffle for
    per-doc state.)"""
    from quackpipe_spark.operators import dedup as D

    # pin the COLD plan: persisted fragments from earlier tests otherwise
    # substitute as InMemoryTableScan, whose cached-plan detail text
    # carries extra Exchange/Aggregate lines
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_text(D.simhash(docs))
    assert "Generate" not in p, "signature must not explode tokens"
    assert "HashAggregate" not in p and "SortAggregate" not in p
    # at most the fan_out repartition moves data (each node prints
    # twice in formatted explain: tree + detail header)
    import re
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1


def test_simhash_near_pairs_no_distinct(spark):
    """Cross-band pair dedup must be the first-matching-band FILTER, not a
    DISTINCT shuffle over the candidate pair set (the pair set scales with
    corpus × bucket density; a stateless predicate does not shuffle it).

    Since the r15 grouped-pairs rewrite the plan is one linear pipeline:
    fold → band posexplode → ONE (band, bv) bucket collect
    (ObjectHashAggregate) → pair emission Generate → filter. The bucket
    collect is the candidate stage itself (it replaces the banded
    SELF-join that re-ran the signature fold per side); what stays
    forbidden is any row-hash aggregate over the emitted PAIRS — a
    distinct would plan as a plain HashAggregate — and any extra
    exchange above the bucket shuffle."""
    import re

    from quackpipe_spark.operators import dedup as D

    # pin the COLD plan: persisted fragments from earlier tests otherwise
    # substitute as InMemoryTableScan, whose cached-plan detail text
    # carries extra Exchange/Aggregate lines
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = D.simhash_near_pairs(D.simhash(docs, bits=32), bits=32, max_hamming=1)
    p = plan_text(out)
    # pair dedup-by-distinct would plan a plain HashAggregate over (a, b);
    # the only aggregates allowed are the bucket collects
    assert not re.findall(r"\(\d+\) HashAggregate", p)
    assert "SortAggregate" not in p
    # no self-join anywhere, and at most two exchanges: the (data-sized,
    # r16) fan-out of the fold input and the one (band, bv) bucket
    # shuffle — at this test's corpus size the fan-out is skipped and a
    # single-partition input satisfies the bucket clustering, so either
    # or both may be absent; extra exchanges above the bucket shuffle
    # stay forbidden
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2
    # pair emission (the top two Generates — r16 chunked form: posexplode
    # member index, then the per-member tail slice, bounding every
    # physical row to O(m)) must sit ABOVE the bucket aggregate: pairs
    # are emitted from collected buckets, never shuffled
    gen_ids = [int(m) for m in re.findall(r"\((\d+)\) Generate", p)]
    agg_ids = [int(m) for m in re.findall(r"\((\d+)\) ObjectHashAggregate", p)]
    assert gen_ids and agg_ids and max(gen_ids) > max(agg_ids)
    assert sum(g > max(agg_ids) for g in gen_ids) == 2, (
        "chunked pair emission is two generates above the bucket collect"
    )
    assert "explode(flatten(transform(" not in p, (
        "pair emission regressed to single-row flatten"
    )


def test_minhash_signatures_explode_never_shuffles(spark):
    """The signature groupBy must be satisfied by the pre-explode hash
    partitioning: exactly ONE exchange in the plan (compact doc rows),
    with the Generate (shingle explode) ABOVE it — the row-multiplied
    shingle table itself never crosses the wire."""
    from quackpipe_spark.operators import dedup as D

    # pin the COLD plan: persisted fragments from earlier tests otherwise
    # substitute as InMemoryTableScan, whose cached-plan detail text
    # carries extra Exchange/Aggregate lines
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_text(D.minhash_signatures(docs, num_hashes=12))
    import re
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, (
        "only the doc repartition may shuffle"
    )
    lines = p.splitlines()
    gen_ids = [int(l.split("(")[1].split(")")[0]) for l in lines if "Generate" in l and "(" in l]
    ex_ids = [int(l.split("(")[1].split(")")[0]) for l in lines if "Exchange" in l and "(" in l]
    assert gen_ids and ex_ids
    # formatted explain numbers bottom-up: the Generate consuming the
    # exchanged docs has a higher id than the exchange
    assert min(gen_ids) > min(ex_ids), "explode must sit above the doc shuffle"


def test_lsh_and_ivf_score_without_norm_refold(spark):
    """Pair scoring must divide by precomputed norms — a norm() re-fold in
    the pair space costs 2 extra array folds per candidate at any scale."""
    from quackpipe_spark.operators import similarity as S2

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter("vec_id < 3")
    p = plan_text(S2.lsh_topk(emb, q, k=5, n_planes=4))
    # one aggregate fold (the dot) in the post-join projection: the scoring
    # project should reference _qnorm/_cnorm, not recompute sqrt(dot(v,v))
    assert "_qnorm" in p and "_cnorm" in p


def test_text_analyze_single_logical_shuffle(spark):
    """analyze(): both the metric projection and the gram counting derive
    from ONE id-repartition; the closing join must not add an exchange of
    its own (co-partitioned SMJ at scale, broadcast under AQE at test
    scale — either way ≤ 2 Exchange nodes: one per subtree, reusable)."""
    import re

    from quackpipe_spark.operators import text as T2

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_text(T2.analyze(docs))
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2


def test_fts_postings_single_shuffle_and_pushdown(spark, tmp_path):
    """build_postings: one exchange (the doc repartition) — the exploded
    token rows never shuffle. bm25_search over an on-disk index pushes
    the term filter into the parquet scan (q-term read, not a full scan)."""
    import re

    from quackpipe_spark.operators import fts

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    postings = fts.build_postings(docs)
    p = plan_text(postings)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, (
        "only the doc repartition may shuffle"
    )
    path = str(tmp_path / "ix")
    fts.write_postings(postings, path, n_buckets=8)
    p2 = plan_text(fts.search_postings_index(spark, path, "spark merge", topk=5))
    assert "In(term, [merge,spark])" in p2, "term filter must reach the scan"
    # the md5 bucket filter must land in PartitionFilters (directory
    # pruning), not just as a data filter
    part_lines = [l for l in p2.splitlines() if "PartitionFilters" in l]
    assert part_lines and any("term_bucket" in l for l in part_lines), (
        "bucket filter must prune partitions"
    )


def test_pack_sequences_single_shuffle(spark):
    """pack_sequences: the sharded window is the only exchange — no global
    sort anywhere in the plan."""
    import re

    from quackpipe_spark.operators import packing as P2

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.selectExpr("doc_id", "length(text) as n_tokens")
    p = plan_text(P2.pack_sequences(toks, n_shards=8))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    # partitioned window, not a global one
    assert "SinglePartition" not in p


def test_chunk_documents_rides_the_scan_stage(spark):
    """chunk_documents: row-local slice explode — ZERO exchanges, no
    python (a UDF would show BatchEvalPython / ArrowEvalPython)."""
    from quackpipe_spark.operators import packing as P2

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_text(P2.chunk_documents(docs, max_tokens=64, overlap=8))
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_mix_domains_rides_the_scan_stage(spark):
    """mix_domains: per-row copy explode — zero exchanges, zero python."""
    from pyspark.sql import functions as F

    from quackpipe_spark.operators.sampling import mix_domains

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_text(
        mix_domains(docs, "source", {"web": 0.5, "wiki": 2.0}, "doc_id")
    )
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_line_dedup_dup_keys_aggregate_is_partial(spark):
    """line_dedup: the cross-doc line count must run with map-side
    partial aggregation (a hot boilerplate line is the skew case), and
    the doc rebuild must be a hash aggregate over the id partitioning —
    never a global sort."""
    from quackpipe_spark.operators.dedup import line_dedup

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_text(line_dedup(docs))
    assert "partial_count" in p  # map-side partial aggregation survives
    assert "Exchange SinglePartition" not in p  # nothing serializes globally


def phys(df) -> str:
    """Physical plan toString — unlike explain('formatted'), each node
    appears exactly once, so substring counts are node counts."""
    return df._jdf.queryExecution().executedPlan().toString()


def test_rebuilt_text_joins_are_merge_not_broadcast(spark):
    """The reassembly joins of line_dedup and strip_duplicate_passages
    carry the full corpus text per doc on an EXCHANGE-FREE aggregate
    (id-partitioning reuse), so AQE never sees their real size — the
    static estimate chose BroadcastHashJoin, collecting the corpus to
    the driver (the jaccard_verify maxResultSize class, r11 100× plan
    audit). Pin the merge hint: the rebuilt side must feed a
    SortMergeJoin, and the only broadcast allowed in line_dedup is the
    thresholded dup-key set (which sits ABOVE a shuffle, so AQE can
    demote it from real stats)."""
    from quackpipe_spark.operators.dedup import line_dedup, strip_duplicate_passages

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = phys(line_dedup(docs))
    assert "SortMergeJoin" in p
    assert p.count("BroadcastExchange") <= 1  # dup-key set only
    p2 = phys(strip_duplicate_passages(docs))
    assert "SortMergeJoin" in p2


def test_text_analyze_rep_join_not_broadcast(spark):
    """analyze(): the per-doc bigram aggregate is exchange-free, so its
    closing join must be the co-partitioned sort-merge the docstring
    promises — a broadcast here collects a corpus-scaled relation to
    the driver on nothing but a static estimate."""
    from quackpipe_spark.operators import text as T2

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = phys(T2.analyze(docs))
    assert "SortMergeJoin" in p
    assert "BroadcastExchange" not in p


def test_jaccard_verify_sets_joins_shuffle_hash(spark):
    """jaccard_verify: the pair⋈shingle-set joins must be shuffled hash
    joins — Catalyst's static estimate of the collect_set aggregate
    picked BroadcastHashJoin with the ARRAY relation as build side,
    which died on maxResultSize at 100× (fixed r11; a count-gated
    broadcast was also tried and measured slower even at sf0.1). The
    id-only candidate semi-join may broadcast (count-gated); the
    fat-array joins must not."""
    from quackpipe_spark.operators import dedup as D

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = docs.limit(2).select(
        (docs.doc_id * 0).alias("a"), (docs.doc_id * 0 + 1).alias("b")
    ).distinct()
    p = phys(D.jaccard_verify(docs, pairs))
    assert p.count("ShuffledHashJoin") == 2


def test_jaccard_verify_gate_path_correct(spark, monkeypatch):
    """Above the id-broadcast gate the semi-join must still produce the
    same pairs (shuffle path), and the gate must actually drop the
    explicit broadcast hint."""
    from quackpipe_spark.operators import dedup as D

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50).cache()
    docs.count()
    pairs = docs.select(
        (docs.doc_id * 0).alias("a"), (docs.doc_id * 0 + 1).alias("b")
    ).distinct()
    baseline = sorted(
        tuple(r) for r in D.jaccard_verify(docs, pairs, threshold=0.0).collect()
    )
    monkeypatch.setattr(D, "_BROADCAST_IDS_MAX", 0)
    gated = sorted(
        tuple(r) for r in D.jaccard_verify(docs, pairs, threshold=0.0).collect()
    )
    assert gated == baseline
    docs.unpersist()


def test_lineproto_literals_are_local_table_scans(spark):
    """The lineproto gate queries must plan their literal inputs as
    LocalTableScan (JVM) — a Scan ExistingRDD means every action pays a
    defaultParallelism-task python round."""
    from quackpipe_spark.workloads import dataflow as DF

    p1 = plan_text(DF.lineproto_parse(spark, SF_DIR))
    assert "ExistingRDD" not in p1
    assert "LocalTableScan" in p1
    p2 = plan_text(DF.QUERIES["lineproto_parse_distributed"](spark, SF_DIR))
    assert "ExistingRDD" not in p2
    assert "LocalTableScan" in p2


def test_duplicate_passages_single_gram_emission(spark):
    """duplicate_passages: the k-amplified gram explode (posexplode of
    the md5 transform) must appear exactly ONCE in the physical plan —
    the dup flagging is window state over one g-partition, not an
    aggregate + join-back that would re-run the emission per branch —
    and nothing is cached."""
    from quackpipe_spark.operators.dedup import duplicate_passages

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_text(duplicate_passages(docs, k=8))
    # formatted explain prints each Generate node once in the tree and
    # its posexplode argument once in the detail section
    assert p.count("posexplode") == 1
    assert "InMemoryTableScan" not in p  # lazy: no hidden cache


def test_bigram_lm_scoring_single_bigram_emission(spark):
    """bigram_lm_score: the model (bigram count table) is cached at
    build, so a scoring action explodes only the SCORED side's bigrams —
    exactly one explode in the plan, everything else InMemoryTableScan.
    (Unpersisted, Catalyst re-expands the corpus explode 4×.)"""
    from quackpipe_spark.operators.text import bigram_lm_score

    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plan_text(bigram_lm_score(docs))
    # every model consumer (count join, prefix table, vocab) must read
    # the cache — an InMemoryTableScan per consumer; textual Generate
    # counting is unreliable here because explain re-prints the cached
    # plan (with its own Generate) under each InMemoryRelation
    assert p.count("InMemoryTableScan") >= 3
    spark.catalog.clearCache()


def test_engine_int64_time_layout_pushes_range_predicates(spark, tmp_path):
    """The engine's OWN time layout (int64 epoch-ns, what the hive writer
    stores and nanosAsLong reads back) must push time-range predicates to
    the parquet scan — the scan-time NTZ conversion documented in
    _normalize_event_time is a driver-testdata compat cost only, so this
    pins the positive control: a plain bigint ts column range-filters via
    PushedFilters, not post-scan."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "native_events")
    spark.range(10_000).select(
        (F.col("id") * 1_000_000_000).alias("ts"),
        (F.col("id") % 5).alias("k"),
    ).write.parquet(path)
    df = (
        spark.read.parquet(path)
        .filter((F.col("ts") >= 2_000_000_000_000) & (F.col("ts") < 3_000_000_000_000))
        .groupBy("k")
        .count()
    )
    p = plan_text(df)
    assert "GreaterThanOrEqual(ts" in p and "LessThan(ts" in p


def test_quality_survivor_single_clustered_pass(spark):
    """The quality-survivor stage (r12) must compute the per-component
    min (cluster key) and the argmax rank (canonical flag) as CHAINED
    window functions over ONE component-clustered exchange — the
    groupBy + join-back formulation it replaced planned an extra
    aggregate exchange plus a per-node ⋈ per-component join, which cost
    corpus_clean +33% at sf0.1 and shuffles the paired-node relation
    twice at any scale."""
    from quackpipe_spark.operators.cluster import cluster_near_dups_by_quality

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, float(i % 7) / 7) for i in range(50)], "doc_id long, quality double"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "a long, b long")
    p = plan_text(cluster_near_dups_by_quality(docs, pairs, edge_bound=3))
    import re

    # two Window ops (min + row_number) in the tree, zero aggregates
    assert len(re.findall(r"Window \(\d+\)", p)) == 2
    assert "HashAggregate" not in p and "SortAggregate" not in p
    # the windows chain: between the two Window operators there is only a
    # Sort (the ordered spec), never another Exchange — one shuffle total
    # for both computations
    seg = re.search(r"Window \(\d+\)(.*?)Window \(\d+\)", p, re.DOTALL)
    assert seg is not None
    assert "Exchange" not in seg.group(1), seg.group(1)
