"""LLM training-data pipeline workloads (north-star operators).

Each query wires an operator from ``quackpipe_spark.operators`` to the
driver contract, with a DuckDB oracle that mirrors the SAME deterministic
algorithm (md5-derived hashes, identical tokenization) — so dedup
candidates, signatures, and similarity scores are bit-comparable across
engines, not just "similar".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackpipe_spark.operators import dedup as D
from quackpipe_spark.operators import multimodal as M
from quackpipe_spark.operators import similarity as S
from quackpipe_spark.operators import text as T


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackpipe_spark.sources.tables import table_df

    return table_df(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quackpipe_spark.sources.tables import table_df

    return table_df(spark, sf_dir, "embeddings")


# shared oracle CTEs: tokenization + 3-gram shingles, mirroring
# dedup.tokenize / dedup.shingles exactly (trim+lower+\s+; k=3 distinct).
_SH_CTE = """
toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
           list_transform(range(1, len(t)-1), i -> array_to_string(t[i:i+2], ' '))
         )) AS shingle
  FROM toks WHERE len(t) >= 3
)
"""


# --- dedup: exact ----------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus has ZERO exact-duplicate texts at the
    verification SFs (sf0.001/sf0.01), so a plain run would verify the
    operator only on singleton clusters — n_copies=1 everywhere, the
    min-id survivor rule never choosing between real candidates (the
    same trivially-passing-gate class as r13's empty-join asof find).
    The gate therefore unions a deterministic replica of every 7th doc
    under a shifted id: ~14% of clusters have n_copies=2 with the
    survivor forced back to the ORIGINAL id at every SF."""
    docs = _docs(spark, sf_dir)
    extra = docs.filter(
        (F.col("doc_id") % 7 == 0) & F.col("text").isNotNull()
    ).withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000_000))
    return D.exact_dedup(docs.unionByName(extra))


DEDUP_EXACT_SQL = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, text FROM documents
  WHERE doc_id % 7 = 0 AND text IS NOT NULL
)
SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies
FROM aug WHERE text IS NOT NULL GROUP BY md5(text)
"""


# --- dedup: minhash + LSH + jaccard verify --------------------------------

# 12 hashes in 4 bands of 3: P(candidate | jaccard .9) = 1-(1-.9³)⁴ ≈ .995,
# higher recall AND 25% less hashing than 16/4×4.
_NUM_HASHES, _BANDS, _ROWS = 12, 4, 3


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_dedup(
        _docs(spark, sf_dir), num_hashes=_NUM_HASHES, bands=_BANDS, threshold=0.8
    )


def _minhash_oracle() -> str:
    mins = ",\n         ".join(
        f"min(md5('{i}|' || shingle)) AS h{i}" for i in range(_NUM_HASHES)
    )
    bands = ",\n         ".join(
        "md5(" + " || ".join(f"h{b * _ROWS + i}" for i in range(_ROWS)) + f") AS bh{b}"
        for b in range(_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, bh{b} AS bh FROM bands" for b in range(_BANDS)
    )
    return f"""
WITH {_SH_CTE},
sigs AS (
  SELECT doc_id, {mins}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, {bands} FROM sigs
),
banded AS ({band_rows}),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM banded l JOIN banded r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cands c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
)
SELECT i.a, i.b, round(i.i::DOUBLE / (na.n + nb.n - i.i), 3) AS jaccard
FROM inter i JOIN sizes na ON na.doc_id = i.a JOIN sizes nb ON nb.doc_id = i.b
WHERE round(i.i::DOUBLE / (na.n + nb.n - i.i), 3) >= 0.8
"""


# --- dedup: rare-shingle blocking + exact n-gram jaccard -------------------

_RARE_MAX_DOCS = 5


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard near-dup with rare-shingle blocking: only pairs
    sharing a shingle that occurs in ≤5 docs are compared (bounds the pair
    space; near-identical docs always share rare shingles)."""
    docs = _docs(spark, sf_dir)
    sh = D.shingle_table(docs)
    # one groupBy builds each rare shingle's sorted doc list AND emits its
    # pairs from the array — two shuffles total (agg, distinct) where the
    # rare-filter + rare⋈sh + self-join formulation pays four; sort_array
    # makes position order = id order, so every emitted pair has a < b.
    # The grouping key is xxhash64(shingle), projected BEFORE the
    # exchange (r13): the (shingle, doc_id) shuffle is THE dominant byte
    # mover of this pipeline (~600M rows at 400×), and an 8 B long key
    # cuts its bytes ~3× vs the raw ~30 B gram string — measured 22-23 s
    # → 15-17 s warm on the 400× blocking stage, identical 7.364M pairs.
    # A cross-shingle hash collision merges two doc lists (probability
    # ~n²/2⁶⁵ over distinct shingles — ~1% odds of ONE collision at
    # 600M): it could only add a spurious candidate (verify rejects) or,
    # astronomically rarer, push a merged group over the rare cap; the
    # DuckDB oracle keeps grouping by the raw gram and stays pair-exact.
    grouped = (
        sh.select(F.xxhash64("shingle").alias("sh_h"), "doc_id")
        .groupBy("sh_h")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= _RARE_MAX_DOCS))
    )
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + F.lit(2), F.size("ids")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.a", "p.b")
        .distinct()
        # tiny pair set, heavy lineage: the checkpoint barrier truncates
        # the plan so verify's branches analyze a leaf, not the whole
        # blocking pipeline (see minhash_candidates for the trade;
        # eager_barrier upgrades to reliable checkpoint() when the
        # session has a checkpoint dir set)
    )
    from quackpipe_spark.operators.util import eager_barrier

    pairs = eager_barrier(pairs)
    n_pairs = pairs.count()  # eager: verify's branches race a lazy cache
    return D.jaccard_verify(docs, pairs, threshold=0.8, pairs_count=n_pairs)


DEDUP_NGRAM_SQL = f"""
WITH {_SH_CTE},
rare AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(DISTINCT doc_id) <= {_RARE_MAX_DOCS}
),
rs AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM rs l JOIN rs r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS i
  FROM cands c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
)
SELECT i.a, i.b, round(i.i::DOUBLE / (na.n + nb.n - i.i), 3) AS jaccard
FROM inter i JOIN sizes na ON na.doc_id = i.a JOIN sizes nb ON nb.doc_id = i.b
WHERE round(i.i::DOUBLE / (na.n + nb.n - i.i), 3) >= 0.8
"""


# --- dedup: simhash --------------------------------------------------------

_SIMHASH_BITS = 32


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = D.simhash(_docs(spark, sf_dir), bits=_SIMHASH_BITS)
    # bands = max_hamming + 1: the MINIMAL pigeonhole split. For
    # hamming ≤ 1, 2 bands of 16 bits have the same EXACT recall as the
    # default 4×8 (one differing bit can spoil at most one band either
    # way — results identical, oracle untouched) but bucket collisions
    # scale as n²/2^band_width: 16-bit bands grow the quadratic term
    # 65536× slower than 8-bit ones. The r11 200× run caught the 8-bit
    # version going superlinear at 1M docs (work-ratio 0.59).
    return D.simhash_near_pairs(sigs, bits=_SIMHASH_BITS, max_hamming=1, bands=2)


def _simhash_oracle() -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN (th >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(_SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END" for j in range(_SIMHASH_BITS)
    )
    bandsel = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {b * 8}) & 255 AS bv FROM sigs"
        for b in range(4)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
  FROM documents
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS th FROM toks
),
sums AS (
  SELECT doc_id, {sums}
  FROM hashed GROUP BY doc_id
),
sigs AS (SELECT doc_id, ({sig})::BIGINT AS simhash FROM sums),
banded AS ({bandsel}),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.simhash AS sa, r.simhash AS sb
  FROM banded l JOIN banded r ON l.band = r.band AND l.bv = r.bv AND l.doc_id < r.doc_id
)
SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(sa, sb)) <= 1
"""


# --- dedup: embedding cosine ----------------------------------------------

# quantizer-cell blocking (not a data column like `label`, whose group
# sizes are unbounded at scale): cells seeded by md5(vec_id) order,
# multi-probe assignment to the 2 nearest cells — both engines derive the
# identical cells from the same recipe, so the oracle mirrors it exactly.
_EMB_CELLS, _EMB_PROBES = 32, 2


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 64-dim non-null contract (see ann_topk_bruteforce): a ragged vector
    # would crash assign_cells' np.array batch outright.
    # n_cells SCALES with the corpus (max(32, ceil(n/512)) — the same
    # arithmetic the oracle SQL computes from its own count, so parity
    # holds at every SF): the r10 scale run showed 32 pinned cells turn
    # the blocked pair space quadratic at 20× data (0.46s→69s). At
    # sf0.1 and below the formula still yields 32, so gate numbers are
    # unchanged; the count() is one cheap job, the index-build step.
    emb = _emb64(spark, sf_dir)
    n_cells = max(_EMB_CELLS, -(-emb.count() // 512))
    return S.blocked_near_pairs(
        emb, threshold=0.40, n_cells=n_cells, probes=_EMB_PROBES
    )


def _emb_dot(x: str, y: str) -> str:
    return f"list_sum(list_transform(range(1, 65), i -> {x}[i]::DOUBLE * {y}[i]::DOUBLE))"


DEDUP_EMBEDDING_SQL = f"""
WITH e64 AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
seeds AS (
  -- cell count scales with the corpus: greatest({_EMB_CELLS}, ceil(n/512)),
  -- the same arithmetic the Spark side computes from emb.count()
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS cell,
         embedding AS center
  FROM e64
  QUALIFY cell <= (SELECT greatest({_EMB_CELLS},
                                   CAST(ceil(count(*) / 512.0) AS BIGINT))
                   FROM e64)
),
base AS (
  SELECT vec_id, embedding, sqrt({_emb_dot('embedding', 'embedding')}) AS nrm
  FROM e64
),
assigned AS (
  SELECT vec_id, embedding, nrm, cell
  FROM (
    SELECT b.vec_id, b.embedding, b.nrm, s.cell,
           round({_emb_dot('b.embedding', 's.center')}
                 / (b.nrm * sqrt({_emb_dot('s.center', 's.center')})), 6) AS _ccos
    FROM base b CROSS JOIN seeds s
  )
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY _ccos DESC, cell ASC) <= {_EMB_PROBES}
)
SELECT DISTINCT a.vec_id AS a, b.vec_id AS b,
       round({_emb_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 4) AS cos
FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE round({_emb_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 4) >= 0.40
"""


# --- similarity search -----------------------------------------------------

def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exactly-64-dim non-null contract like the other ANN gates: a short
    # vector gives Spark's zip_with a NULL-padded (NULL) cosine while
    # DuckDB's list_sum skips nulls to a finite partial sum — exclude
    # explicitly on both engines rather than differ silently
    emb = _emb64(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return S.brute_force_topk(emb, queries, k=10)


# query↔corpus cosine at 6dp, composed from the single-sourced _emb_dot
# (an earlier revision string-munged a duplicate recipe via .replace)
_COS_QC = (
    f"round({_emb_dot('q.embedding', 'c.embedding')}\n"
    f"  / (sqrt({_emb_dot('q.embedding', 'q.embedding')})\n"
    f"     * sqrt({_emb_dot('c.embedding', 'c.embedding')})), 6)"
)

ANN_TOPK_SQL = f"""
WITH e64 AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_QC} AS cos
  FROM e64 q JOIN e64 c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 5
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos FROM ranked WHERE rank <= 10
"""


# Built IVF indexes, one per (session, sf_dir): the one-time build is
# WRITTEN to a parquet index (postings partitioned by cell + centers) —
# the 100TB serving layout — and every search opens a lazy partition-
# pruned scan over it. Serving from a written index rather than a pinned
# DataFrame means an external clearCache() can no longer force a full
# re-assignment pass in the middle of the serving path (the r7 shape:
# per-rep clearCache made each "search" pay an index rebuild). The pinned
# 5-vector query batch is fetched ONCE alongside the build and cached with
# it — the ann_topk_pq contract, where the prebuilt serving state includes
# the pinned query vector(s) and the timed query inlines them as literals;
# the oracle still re-derives the batch from parquet (WHERE vec_id < 5),
# so correctness stays end-to-end.
_IVF_CACHE: dict[tuple[int, str], tuple["S.Centers", DataFrame, list[tuple]]] = {}

_IVF_CELLS, _IVF_NPROBE = 16, 4


def _purge_dead_entries(cache: dict) -> None:
    """Drop prebuild-cache entries whose session has stopped (each pins
    JVM plan references and, for IVF, a corpus-sized tempdir index until
    process exit) — the same purge-on-miss discipline as
    sources.tables._SCAN_CACHE (review r12). Values carry a DataFrame at
    index 1; an entry whose session can't be read counts as dead."""
    from quackpipe_spark.sources.tables import _session_alive

    for k, v in list(cache.items()):
        try:
            dead = not _session_alive(v[1].sparkSession)
        except Exception:
            dead = True
        if dead:
            cache.pop(k, None)


def ivf_index_for(spark: SparkSession, sf_dir: str) -> tuple["S.IvfIndex", list[tuple]]:
    import atexit
    import shutil
    import tempfile

    key = (id(spark), sf_dir)
    hit = _IVF_CACHE.get(key)
    if hit is None:
        _purge_dead_entries(_IVF_CACHE)
        # 64-dim non-null contract like every other ANN gate: one ragged
        # or NULL embedding would crash assign_cells' matrix build inside
        # the index job while the oracle kept returning rows
        built = S.build_seeded_ivf_index(_emb64(spark, sf_dir), n_cells=_IVF_CELLS)
        path = tempfile.mkdtemp(prefix="qps_ivf_idx_")
        # the written index is corpus-sized; without cleanup every
        # session leaks one copy into the temp filesystem
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        S.write_ivf_index(built, path)
        built.unpersist()
        qrows = sorted(
            (r["vec_id"], list(r["embedding"]))
            for r in _emb64(spark, sf_dir)
            .filter(F.col("vec_id") < 5)
            .select("vec_id", "embedding")
            .collect()
        )
        if not qrows:
            raise ValueError(
                "pinned IVF query batch vec_id < 5 is absent from the "
                "corpus — cannot build the gate query"
            )
        # the LAZY scan plan is cached too: re-opening the reader per call
        # re-lists files + re-infers schema (~0.13s of driver latency); the
        # plan is not a materialized Dataset — every action still reads the
        # (immutable) index files — so caching it skips only that re-open
        assigned = spark.read.parquet(f"{path}/postings").select(
            "neighbor_id", "cvec", "cnorm", F.col("cell").cast("int").alias("cell")
        )
        hit = (built.centers, assigned, qrows)
        _IVF_CACHE[key] = hit
    centers, assigned, qrows = hit
    return S.IvfIndex(centers=centers, assigned=assigned), qrows


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k over a built index (build once, search many).

    The gate pins the ZERO-ITERATION seeded quantizer
    (similarity.build_seeded_ivf_index: centers = first n_cells vectors in
    md5(id) order, the dedup_embedding_cosine recipe) so the DuckDB oracle
    can re-derive the identical index and hash-verify the whole
    probe→cell-join→rank search path. The trained k-means build
    (build_ivf_index) stays the library default and is recall- and
    roundtrip-tested in tests/test_llm_ops.py.

    Serving shape: the pinned 5-query probe batch takes the small-batch
    path (similarity.ivf_search_rows) — query vectors fetched once with
    the index build (prebuilt serving state, the ann_topk_pq contract),
    probes planned driver-side per call, postings read via static cell
    partition pruning, so the timed search is ONE pruned Spark job; the
    big-batch distributed path (ivf_search) keeps its own parity tests."""
    index, qrows = ivf_index_for(spark, sf_dir)
    return S.ivf_search_rows(index, qrows, k=10, nprobe=_IVF_NPROBE)


def _ivf_oracle(n_cells: int = _IVF_CELLS, nprobe: int = _IVF_NPROBE) -> str:
    """The seeded-IVF search restated for DuckDB: identical center seeding
    (md5(id) order), identical probes-nearest-cell assignment (cosine
    rounded to 6, tie-break on cell id — the assign_cells contract), then
    rank within probed cells only. Approximate result, exactly mirrored
    (both engines filter to the 64-dim non-null contract first)."""
    return f"""
WITH e64 AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
seeds AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS cell,
         embedding AS center
  FROM e64
  QUALIFY cell <= {n_cells}
),
base AS (
  SELECT vec_id, embedding, sqrt({_emb_dot('embedding', 'embedding')}) AS nrm
  FROM e64
),
cell_scores AS (
  SELECT b.vec_id, b.embedding, b.nrm, s.cell,
         round({_emb_dot('b.embedding', 's.center')}
               / (b.nrm * sqrt({_emb_dot('s.center', 's.center')})), 6) AS _ccos
  FROM base b CROSS JOIN seeds s
),
corpus_assigned AS (
  SELECT vec_id, embedding, nrm, cell FROM cell_scores
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY _ccos DESC, cell ASC) <= 1
),
query_probed AS (
  SELECT vec_id, embedding, nrm, cell FROM cell_scores
  WHERE vec_id < 5
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY _ccos DESC, cell ASC) <= {nprobe}
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_emb_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm), 6) AS cos
  FROM query_probed q
  JOIN corpus_assigned c ON c.cell = q.cell AND c.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
FROM ranked WHERE rank <= 10
"""


def prebuild(spark: SparkSession, sf_dir: str) -> None:
    """Warmup hook (bench): build the one-time artifacts — the IVF index —
    outside any per-query timing."""
    ivf_index_for(spark, sf_dir)


_LSH_PLANES, _LSH_DIMS = 4, 64


def ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane buckets. The hyperplanes are
    md5-derived ±1 literals (similarity.hyperplane_buckets), so the oracle
    restates the identical recipe in SQL; recall vs brute force is asserted
    separately in tests/test_llm_ops.py.

    Both engines pre-filter to exactly-64-dim non-null vectors: for NULL
    or short embeddings the engines' fold semantics diverge (Spark's
    zip_with propagates NULL → NULL bucket → row drops; DuckDB's
    list_sum SKIPS nulls → partial projection → bucket 0-ish), so the
    contract excludes them explicitly rather than differing silently."""
    emb = _emb(spark, sf_dir).filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == _LSH_DIMS)
    )
    queries = emb.filter(F.col("vec_id") < 5)
    return S.lsh_topk(emb, queries, k=10, n_planes=_LSH_PLANES, dims=_LSH_DIMS)


def _lsh_oracle(n_planes: int = _LSH_PLANES, dims: int = _LSH_DIMS) -> str:
    """The lsh_topk recipe restated for DuckDB: hyperplane p's component i
    is the same driver-side md5 literal Spark inlines (low bit of
    md5('{p}|{i}')), projections fold in ascending-dim order (list_sum ==
    the JVM fold, bit-identical), bucket = Σ sign_bit<<p."""
    import hashlib

    def sign(p: int, i: int) -> str:
        up = hashlib.md5(f"{p}|{i}".encode()).digest()[-1] & 1
        return "1.0" if up else "-1.0"

    plane_lists = ",\n         ".join(
        "[" + ", ".join(sign(p, i) for i in range(dims)) + f"] AS s{p}"
        for p in range(n_planes)
    )
    projs = ",\n         ".join(
        f"list_sum(list_transform(range(1, {dims + 1}), "
        f"i -> embedding[i]::DOUBLE * s{p}[i])) AS p{p}"
        for p in range(n_planes)
    )
    bucket = " + ".join(
        f"CASE WHEN p{p} >= 0 THEN {1 << p} ELSE 0 END" for p in range(n_planes)
    )
    qc_dot = f"list_sum(list_transform(range(1, {dims + 1}), i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))"
    return f"""
WITH planes AS (
  SELECT {plane_lists}
),
base AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(range(1, {dims + 1}),
              i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm,
         {projs}
  FROM embeddings CROSS JOIN planes
  WHERE embedding IS NOT NULL AND len(embedding) = {dims}
),
bucketed AS (
  SELECT vec_id, embedding, nrm, {bucket} AS bucket FROM base
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({qc_dot} / (q.nrm * c.nrm), 6) AS cos
  FROM bucketed q JOIN bucketed c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
  WHERE q.vec_id < 5
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos
FROM ranked WHERE rank <= 10
"""


# --- product quantization (gate row) ---------------------------------------

_PQ_M, _PQ_K, _PQ_SAMPLE = 4, 16, 512
_PQ_TOPK, _PQ_SHORTLIST, _PQ_NQ = 10, 40, 5

# (session, sf_dir) → (books, persisted codes, query batch): the PQ index
# is built once per engine lifetime (the ivf_index_for model); the gate row
# times the multi-query ADC-search + rerank path.
_PQ_CACHE: dict[tuple[int, str], tuple] = {}


def _emb64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ/LSH corpus contract: exactly-64-dim non-null vectors (see
    ann_topk_lsh's docstring for why the NULL/short rows are excluded
    explicitly on both engines)."""
    return _emb(spark, sf_dir).filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == _LSH_DIMS)
    )


def pq_index_for(spark: SparkSession, sf_dir: str):
    key = (id(spark), sf_dir)
    hit = _PQ_CACHE.get(key)
    if hit is None:
        _purge_dead_entries(_PQ_CACHE)
        emb = _emb64(spark, sf_dir)
        books = S.seeded_pq_codebooks(
            emb, m=_PQ_M, k=_PQ_K, sample=_PQ_SAMPLE, dims=_LSH_DIMS
        )
        qbatch = sorted(
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id") < _PQ_NQ)
            .select("vec_id", "embedding")
            .collect()
        )
        if not qbatch:
            raise ValueError(
                f"pinned PQ query batch vec_id < {_PQ_NQ} is absent from "
                "the 64-dim corpus — cannot build the gate query"
            )
        codes = S.pq_encode(
            emb, books, normalize=False, d2_round=6
        ).persist()
        codes.count()  # eager: search must never re-run the encode
        hit = (books, codes, qbatch)
        _PQ_CACHE[key] = hit
    else:
        codes = hit[1]
        if not (codes.storageLevel.useMemory or codes.storageLevel.useDisk):
            codes.persist()
            codes.count()
    return hit


def pq_prebuild(spark: SparkSession, sf_dir: str) -> None:
    """Warmup hook (bench): build the PQ index outside per-query timing."""
    pq_index_for(spark, sf_dir)


def ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ's memory path under the driver gate: MULTI-query ADC search
    over a product-quantized encoding in ONE pass over the code table
    (similarity.pq_topk_multi — the 100TB-realistic serving entry point:
    N queries' lookup tables inlined as literals, one scan amortized
    across the batch), shortlist-then-rerank to exact cosine per query.

    The gate pins the ZERO-ITERATION seeded codebooks
    (similarity.seeded_pq_codebooks: centers = first k distinct RAW
    subvectors in md5(id) order) with raw-subvector encoding and
    rounded squared distances, so the DuckDB oracle re-derives the
    identical codebooks, codes, per-query ADC lookup tables, shortlists
    and reranks from the parquet alone — the whole lossy path
    hash-verified. The trained k-means codebook (train_pq) stays the
    library default and is recall-tested in tests/test_pq.py; the
    single-query path (pq_topk) keeps its own differential tests."""
    books, codes, qbatch = pq_index_for(spark, sf_dir)
    out = S.pq_topk_multi(
        codes,
        books,
        qbatch,
        topk=_PQ_TOPK,
        rerank=_emb64(spark, sf_dir),
        shortlist=_PQ_SHORTLIST,
        normalize_query=False,
    )
    # F.lit(int) types the inlined query ids INT; the corpus ids (and the
    # oracle's query_id) are parquet BIGINT
    return out.withColumn("query_id", F.col("query_id").cast("long"))


def _pq_oracle(
    m: int = _PQ_M,
    k: int = _PQ_K,
    sample: int = _PQ_SAMPLE,
    dims: int = _LSH_DIMS,
    nq: int = _PQ_NQ,
    topk: int = _PQ_TOPK,
    shortlist: int = _PQ_SHORTLIST,
) -> str:
    """The seeded multi-query PQ search restated for DuckDB: identical
    md5-ordered sample, per-subspace first-k-distinct raw-subvector
    codebooks, nearest-code encoding (d² rounded to 6, ties → lower
    code), per-query ADC via the same 9-rounded lookup tables, per-query
    shortlist cut at the same (adc DESC, id ASC) order, exact-cosine
    rerank of each shortlist."""
    dsub = dims // m
    return f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = {dims}
),
seeds AS (
  SELECT embedding, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS rk
  FROM base
  QUALIFY rk <= {sample}
),
subspaces AS (SELECT unnest(range(1, {m + 1})) AS sub),
seed_subvecs AS (
  SELECT s.sub, o.rk,
         list_transform(range(1, {dsub + 1}),
                        i -> o.embedding[(s.sub - 1) * {dsub} + i]::DOUBLE) AS v
  FROM seeds o CROSS JOIN subspaces s
),
codebook AS (
  SELECT sub, v AS center,
         CAST(row_number() OVER (PARTITION BY sub ORDER BY first_rk) - 1 AS INT) AS code
  FROM (SELECT sub, v, min(rk) AS first_rk FROM seed_subvecs GROUP BY sub, v)
  QUALIFY code < {k}
),
corpus_subvecs AS (
  SELECT b.vec_id, s.sub,
         list_transform(range(1, {dsub + 1}),
                        i -> b.embedding[(s.sub - 1) * {dsub} + i]::DOUBLE) AS v
  FROM base b CROSS JOIN subspaces s
),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT cs.vec_id, cs.sub, cb.code,
           round(list_sum(list_transform(range(1, {dsub + 1}),
                 i -> (cs.v[i] - cb.center[i]) * (cs.v[i] - cb.center[i]))), 6) AS d2
    FROM corpus_subvecs cs JOIN codebook cb USING (sub)
  )
  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, code ASC) = 1
),
qs AS (SELECT vec_id AS query_id, embedding FROM base WHERE vec_id < {nq}),
lut AS (
  SELECT q.query_id, cb.sub, cb.code,
         round(list_sum(list_transform(range(1, {dsub + 1}),
               i -> cb.center[i] * q.embedding[(cb.sub - 1) * {dsub} + i]::DOUBLE)), 9) AS w
  FROM codebook cb CROSS JOIN qs q
),
adc AS (
  -- ordered fold (list in sub order, then list_sum's sequential fold):
  -- sum() over a hash-join group adds in unspecified order and the
  -- 9-rounded w values are not binary-exact, so order can flip the
  -- last ulp across a 1e-6 rounding edge — the same determinism
  -- discipline every other float oracle here follows
  SELECT l.query_id, e.vec_id AS neighbor_id,
         round(list_sum(list(l.w ORDER BY l.sub)), 6) AS adc_cos
  FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
  GROUP BY l.query_id, e.vec_id
),
short AS (
  SELECT query_id, neighbor_id FROM adc
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY adc_cos DESC, neighbor_id ASC) <= {shortlist}
),
exact AS (
  SELECT s.query_id, c.vec_id AS neighbor_id,
         round({_emb_dot('c.embedding', 'q.embedding')}
               / (sqrt({_emb_dot('c.embedding', 'c.embedding')})
                  * sqrt({_emb_dot('q.embedding', 'q.embedding')})), 6) AS cos
  FROM base c
  JOIN short s ON s.neighbor_id = c.vec_id
  JOIN qs q ON q.query_id = s.query_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank,
       cos
FROM exact
QUALIFY rank <= {topk}
"""


# --- text analysis ---------------------------------------------------------

def text_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus is lowercase-alnum words only — no
    punctuation, emails, IPs, URLs, or phones — so a plain run verified
    punct_ratio/n_emails/n_urls as constant zeros and the 3-pass
    redact_pii chain as an IDENTITY hash (another trivially-passing-gate
    dimension). The gate appends a deterministic per-doc PII tail
    (email, IPv4, URL, phone — the forms the Java/RE2-intersection
    differential pins) to 4/5 of docs, so every extraction signal and
    all three redact passes fire with doc-varying values at every SF
    while the untouched fifth keeps the zero path and the corpus's
    short-doc quality variance alive. The filler words (pii/ip/url/tel)
    are in NO stopword list, preserving the langid variance."""
    docs = _docs(spark, sf_dir)
    return T.analyze(docs.withColumn("text", _text_aug_col()))


def _text_aug_col():
    """The text_analyze gate's PII augmentation as a Column (shared with
    the non-triviality pin in tests, which must hash the SAME augmented
    text the gate analyzed — comparing against the raw corpus text would
    make its redaction-non-identity assertion vacuous)."""
    return F.when(F.col("doc_id") % 5 == 4, F.col("text")).otherwise(
        F.concat(
            F.col("text"),
            F.lit(" pii user"),
            F.col("doc_id").cast("string"),
            F.lit("@corp.example.org ip 10.0.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(" url https://ex.org/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" tel 555-123-4567!"),
        )
    )


# the same augmentation, rendered once for the oracle (DuckDB int || str
# coerces like Spark's cast-to-string concat)
_TEXT_AUG_SRC = (
    "(SELECT doc_id, CASE WHEN doc_id % 5 = 4 THEN text ELSE"
    " text || ' pii user' || doc_id"
    " || '@corp.example.org ip 10.0.0.' || (doc_id % 200)"
    " || ' url https://ex.org/d/' || doc_id"
    " || ' tel 555-123-4567!' END AS text FROM documents)"
)


def _text_oracle(
    repetition: bool = True, redact: bool = True, source: str = "documents"
) -> str:
    """``repetition=False`` mirrors analyze(repetition=False): no gram
    CTEs, no top_bigram_ratio column (used by the corpus-clean wrapper,
    which only consumes row-local columns — keeps both engines' work
    symmetric). ``redact`` mirrors analyze(redact=...): the md5 of the
    three-pass PII redaction chain, the flag corpus-clean turns off so
    neither engine computes a column the pipeline drops."""
    sw = {k: "[" + ", ".join(f"'{w}'" for w in v) + "]" for k, v in T.STOPWORDS.items()}
    hits = ", ".join(
        f"len(list_intersect(dt, {sw[lang]})) AS hit_{lang}" for lang in T.STOPWORDS
    )
    best = "greatest(" + ", ".join(f"hit_{lang}" for lang in T.STOPWORDS) + ")"
    langs = list(T.STOPWORDS)
    lang_case = "CASE " + " ".join(
        f"WHEN hit_{lang} = best AND best > 0 THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    rep_ctes = """, grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS gram
  FROM base WHERE len(t) >= 2
), gcounts AS (
  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram
), rep AS (
  SELECT doc_id, round(max(c) / sum(c), 4) AS top_bigram_ratio
  FROM gcounts GROUP BY doc_id
)""" if repetition else ""
    rep_col = (
        ",\n       coalesce(r.top_bigram_ratio, 0.0) AS top_bigram_ratio"
        if repetition
        else ""
    )
    rep_join = "LEFT JOIN rep r ON r.doc_id = b.doc_id" if repetition else ""
    redact_col = (
        ",\n       md5(regexp_replace(regexp_replace(regexp_replace("
        f"text, '{T.EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{T.IPV4_RE}', '<IP>', 'g'), "
        f"'{T.PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp"
        if redact
        else ""
    )
    return f"""
WITH base AS (
  SELECT doc_id, text,
         string_split_regex(trim(lower(text)), '\\s+') AS t,
         regexp_replace(text, '[^\\p{{L}}\\p{{N}}\\s]', '', 'g') AS stripped,
         regexp_replace(lower(text), '[^\\p{{L}}\\p{{N}}\\s]', ' ', 'g') AS norm
  FROM {source}
), ext AS (
  SELECT doc_id, text, t,
         list_distinct(t) AS dt,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(t) AS INT) AS n_tokens,
         CAST(list_sum(list_transform(t, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens_est,
         round((length(text) - length(stripped)) / greatest(length(text), 1)::DOUBLE, 4) AS punct_ratio,
         list_sort(list_distinct(string_split_regex(trim(norm), '\\s+'))) AS norm_toks
  FROM base
), scored AS (
  SELECT *, {hits},
         round(len(list_intersect(dt, {sw['en']})) / greatest(len(dt), 1)::DOUBLE, 4) AS stopword_ratio_en,
         (CASE WHEN n_chars BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.0 END
          + CASE WHEN n_chars / greatest(n_tokens, 1)::DOUBLE BETWEEN 2.5 AND 12 THEN 1.0 ELSE 0.0 END
          + CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END) / 3.0 AS q_raw
  FROM ext
), best_cte AS (
  SELECT *, {best} AS best FROM scored
){rep_ctes}
SELECT b.doc_id, n_chars, n_tokens, bpe_tokens_est, punct_ratio, stopword_ratio_en,
       round(1 - len(dt) / greatest(len(t), 1)::DOUBLE, 4) AS dup_token_ratio,
       CAST(len(regexp_extract_all(text, '{T.EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{T.URL_RE}')) AS INT) AS n_urls,
       round(q_raw, 4) AS quality,
       {lang_case} AS lang_detected,
       md5(array_to_string(norm_toks, ' ')) AS fingerprint{redact_col}{rep_col}
FROM best_cte b {rep_join}
"""


# --- multimodal ------------------------------------------------------------

def multimodal_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = M.attach_binary(_docs(spark, sf_dir))
    return M.media_summary(media)


MULTIMODAL_SUMMARY_SQL = """
SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       count(*) AS n,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       round(avg(octet_length(encode(text))), 2) AS avg_bytes
FROM documents GROUP BY 1
"""


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode plumbing (stubbed decode, real Arrow/mapInPandas path).

    The gate projection is scalar-only: ``decode_media`` keeps its
    ``feature array<float>`` output for library users, but the driver
    canonicalizer sorts every result column and list cells are unhashable
    in pandas — so the gate emits the sha256-derived decode profile
    (width/height/n_frames, DuckDB-reproducible) plus the feature
    dimensionality as the plumbing witness."""
    media = M.attach_binary(_docs(spark, sf_dir))
    decoded = M.decode_media(media, fake=True)
    return decoded.select(
        "media_id",
        "kind",
        "width",
        "height",
        "n_frames",
        F.size("feature").alias("feature_dim"),
    )


# mirrors multimodal._fake_decode exactly: struct.unpack('>HHH', sha256[:6])
# = three big-endian uint16 = hex chars [1..4], [5..8], [9..12] of the digest;
# NULL-text rows have no payload and decode_media skips them, so the
# oracle excludes them too
MULTIMODAL_DECODE_SQL = """
WITH parts AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         ('0x' || substr(sha256(text), 1, 4))::INT AS a,
         ('0x' || substr(sha256(text), 5, 4))::INT AS b,
         ('0x' || substr(sha256(text), 9, 4))::INT AS c
  FROM documents
  WHERE text IS NOT NULL
)
SELECT media_id, kind,
       CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + a % 1024 END AS INT) AS width,
       CAST(CASE WHEN kind = 'audio' THEN 0 ELSE 64 + b % 1024 END AS INT) AS height,
       CAST(CASE WHEN kind = 'image' THEN 1
                 WHEN kind = 'video' THEN 1 + c % 300
                 ELSE 1 + c % 100 END AS INT) AS n_frames,
       CAST(8 AS INT) AS feature_dim
FROM parts
"""


# --- flagship composition: end-to-end corpus cleaning ----------------------

_SHARD_FRACTION, _SHARD_SALT = 0.9, "shard0"


def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data cleanup in one declarative pipeline:
    quality-score every doc, detect near-duplicates (minhash→LSH→jaccard),
    close the dup pairs into connected components (operators/cluster.py —
    large-star/small-star, so chained duplicates a≈b≈c collapse to ONE
    survivor even when (a,c) was never emitted as a pair), keep each
    cluster's HIGHEST-QUALITY member (cluster_near_dups_by_quality — the
    curation move: a near-dup cluster ships its cleanest rendering, not
    whichever crawl happened to get the smallest id; ties → min id so
    the choice stays deterministic across engines; r12, VERDICT r11 #7),
    emit the surviving corpus with its quality metadata, and hash-sample
    the final deterministic training shard (reproducible at any
    parallelism — operators/sampling.py). This is the query a reference
    user runs to produce a training shard — every stage is the
    oracle-verified operator from above, composed; the oracle mirrors
    the component closure with a recursive CTE and the survivor argmax
    with a window."""
    from quackpipe_spark.operators.cluster import cluster_near_dups_by_quality
    from quackpipe_spark.operators.sampling import hash_sample

    docs = _docs(spark, sf_dir)
    # repetition=False: the grouped bigram signal would be computed and
    # discarded (Catalyst cannot prune the join) — the needed columns are
    # all row-local
    scored = T.analyze(docs, repetition=False, redact=False).select(
        "doc_id", "quality", "lang_detected", "n_tokens"
    )
    # shared candidate stage: the materialized LSH candidate count (an
    # upper bound on verified pairs) feeds connected_components'
    # edge_bound — keeping the closure LAZY: the union-find fuses into
    # the final job instead of paying a separate probe action that
    # would serialize jaccard_verify (persist/race rationale lives in
    # dedup.minhash_candidates).
    cands, n_cands = D.minhash_candidates(
        docs, num_hashes=_NUM_HASHES, bands=_BANDS, shingle_k=3
    )
    pairs = D.jaccard_verify(
        docs, cands, threshold=0.8, pairs_count=n_cands
    ).select("a", "b")
    # transitive closure + quality-aware survivor: each cluster keeps its
    # argmax-quality member (ties → min id); singletons keep themselves
    annotated = cluster_near_dups_by_quality(
        scored, pairs, id_col="doc_id", score_col="quality",
        edge_bound=n_cands,
    )
    kept = annotated.filter(
        F.col("is_canonical") & (F.col("quality") >= 0.6)
    ).select("doc_id", "quality", "lang_detected", "n_tokens")
    return hash_sample(kept, "doc_id", _SHARD_FRACTION, salt=_SHARD_SALT)


def _corpus_clean_oracle() -> str:
    from quackpipe_spark.operators.sampling import hash_sample_sql

    minhash = _minhash_oracle().strip()
    text = _text_oracle(repetition=False, redact=False).strip()
    # wrap both full oracles as CTE-able subqueries
    return f"""
WITH RECURSIVE dup_pairs AS ({minhash}),
sym AS (
  SELECT a AS u, b AS v FROM dup_pairs WHERE a <> b
  UNION
  SELECT b AS u, a AS v FROM dup_pairs WHERE a <> b
),
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
),
labels AS (
  SELECT u AS node, least(u, min(v)) AS component FROM reach GROUP BY u
),
scored AS ({text}),
surv AS (
  SELECT node FROM (
    SELECT l.node,
           row_number() OVER (
             PARTITION BY l.component ORDER BY s.quality DESC, l.node ASC
           ) AS rn
    FROM labels l JOIN scored s ON s.doc_id = l.node
  ) WHERE rn = 1
)
SELECT doc_id, quality, lang_detected, n_tokens
FROM scored
WHERE quality >= 0.6
  AND (doc_id NOT IN (SELECT node FROM labels)
       OR doc_id IN (SELECT node FROM surv))
  AND {hash_sample_sql('doc_id', _SHARD_FRACTION, _SHARD_SALT)}
"""


def udf_levenshtein_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python extension-point GATE (VERDICT r11 #1): an Arrow pandas
    UDF whose semantics DuckDB also has natively (``levenshtein``), so the
    UDF execution path itself — Arrow batch transfer, null handling,
    long-typed return — hash-matches the oracle. Measures per-doc edit
    distance between the first 40 printable-ASCII chars and their
    REVERSAL — a genuinely non-trivial DP per row (the synthetic corpus
    is already lowercase-alnum, so a case/punct normalization pair
    degenerates to all-zero distances — caught in r12 when the gate's
    sum came back 0). The trailing filter references the UDF column so a
    count() action can never prune the Python stage out of the timing.
    zlib ``compression_ratio`` stays the library's sample UDF
    (tests/test_extensions_planner.py); it is not SQL-expressible, so the
    gate row uses this provable function instead."""
    from quackpipe_spark.functions.extensions import levenshtein_vec
    from quackpipe_spark.operators.util import fan_out

    # data-sized fan-out (guide §4/§2.2), 128 KB/task: the Arrow UDF's
    # cost is per ROW (a 40-char DP per doc), so a coarse divisor
    # serializes real Python work at growth SFs (+45% at 20× with
    # 4 MB/task) — at 128 KB a toy corpus still skips the exchange and
    # anything past a few MB fans fully out
    docs = fan_out(_docs(spark, sf_dir), bytes_per_task=128 << 10)
    a = F.substring(F.regexp_replace("text", r"[^\x20-\x7e]", ""), 1, 40)
    # asNondeterministic: the trailing filter references the UDF column,
    # and the optimizer's filter pushdown otherwise DUPLICATES the Arrow
    # stage — one ArrowEvalPython below the fan_out Exchange (i.e. on the
    # single pre-repartition scan split: the whole corpus through one
    # Python worker) plus a second one above it (guide §4.4; r15 plan
    # audit). Marking the call nondeterministic pins a single evaluation
    # after the fan-out; the function is pure, so results are unchanged.
    lev = levenshtein_vec.asNondeterministic()
    return docs.select(
        "doc_id", lev(a, F.reverse(a)).alias("edit_distance")
    ).filter(F.col("edit_distance") >= 0)


UDF_LEVENSHTEIN_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         substr(regexp_replace(text, '[^\x20-\x7e]', '', 'g'), 1, 40) AS a
  FROM documents
)
SELECT doc_id, levenshtein(a, reverse(a)) AS edit_distance
FROM norm
WHERE levenshtein(a, reverse(a)) >= 0
"""


def text_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized zlib scoring — library sample of a UDF that truly
    needs Python (no SQL equivalent, so no oracle row; the oracle-proven
    extension-point gate is ``udf_levenshtein_normalized``)."""
    from quackpipe_spark.functions.extensions import compression_ratio
    from quackpipe_spark.operators.util import fan_out

    docs = fan_out(_docs(spark, sf_dir), bytes_per_task=128 << 10)
    return docs.select(
        "doc_id",
        F.round(compression_ratio("text"), 4).alias("compression_ratio"),
    ).filter(F.col("compression_ratio") < 0.5)


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_topk_lsh": ann_topk_lsh,
    "ann_topk_ivf": ann_topk_ivf,
    "ann_topk_pq": ann_topk_pq,
    "text_analyze": text_analyze,
    "multimodal_summary": multimodal_summary,
    "multimodal_decode": multimodal_decode,
    "corpus_clean_pipeline": corpus_clean_pipeline,
    "udf_levenshtein_normalized": udf_levenshtein_normalized,
}

# queries whose timing contract assumes a prebuilt artifact (bench runs the
# hook untimed after each cache clear; the driver's correctness run doesn't
# need it — ivf_index_for serves from a written parquet index, so a
# clearCache is harmless, and the pq cache self-heals)
PREBUILD = {"ann_topk_ivf": prebuild, "ann_topk_pq": pq_prebuild}

# queries that run driver-side work during plan construction (persist+count
# of an intermediate, an index build, a query-batch collect): the registry's
# plan cache must rebuild these per call — that work is part of the query,
# and a memoized plan would either race a cleared cache or silently amortize
# a collect the timing is supposed to include.
STATEFUL = {
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "corpus_clean_pipeline",
}
# dedup_simhash left the set in r15: the grouped-pairs rewrite of
# simhash_near_pairs removed its signature persist()+count() barrier, so
# construction is a pure plan (no jobs, no pinned state) — the same
# reason dedup_embedding_cosine left in r7. The three remaining entries
# still materialize their candidate set eagerly (localCheckpoint+count)
# at build; that work IS the query and must be rebuilt per call.
# dedup_embedding_cosine left the set in r7: blocked_near_pairs no longer
# persists an intermediate (the canonical-cell emit removed the last one);
# its only build-time driver work is the deterministic seeded-centers
# collect, which the plan cache exists to memoize (pure plan thereafter).
# ann_topk_ivf / ann_topk_pq are out for the same reason: the pinned query
# batch/vector is fetched ONCE with the index build (prebuilt serving
# state — the PREBUILD hook's job, run outside the timer; ivf_index_for /
# pq_index_for self-heal after an external clearCache), and the search
# DataFrame is then a pure plan with the queries inlined as literals over
# an on-disk (ivf) or session-cached (pq) index. If the pq cache is
# dropped mid-query the memoized plan recomputes lazily — correct, just
# timed where it happens; the ivf index is parquet, so nothing to drop.

ORACLE = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_minhash_lsh": _minhash_oracle(),
    "dedup_ngram_jaccard": DEDUP_NGRAM_SQL,
    "dedup_simhash": _simhash_oracle(),
    "dedup_embedding_cosine": DEDUP_EMBEDDING_SQL,
    "ann_topk_bruteforce": ANN_TOPK_SQL,
    "ann_topk_lsh": _lsh_oracle(),
    "ann_topk_ivf": _ivf_oracle(),
    "ann_topk_pq": _pq_oracle(),
    "text_analyze": _text_oracle(source=_TEXT_AUG_SRC),
    "multimodal_summary": MULTIMODAL_SUMMARY_SQL,
    "multimodal_decode": MULTIMODAL_DECODE_SQL,
    "corpus_clean_pipeline": _corpus_clean_oracle(),
    # the pandas-UDF extension point is oracle-proven via DuckDB's native
    # levenshtein (r12); text_compression_quality (zlib) stays a library
    # sample — unit/differential-tested, deliberately not a gate row. The
    # k-means IVF build is recall-tested in tests (the gate pins the
    # seeded quantizer so its oracle above is exact).
    "udf_levenshtein_normalized": UDF_LEVENSHTEIN_SQL,
}
