"""Similarity search over embedding columns (array<float>).

Scale design:

- **cosine** is pure JVM expression work: zip_with product + aggregate
  fold in double precision — no UDF. (Measured: the higher-order-function
  form beats a 64-term unrolled element_at sum ~3× — the unrolled codegen
  blows past the inline threshold and re-derefs the array per term.)
- **brute-force top-k** broadcasts the (small) query set against the
  corpus: the corpus never shuffles, each partition ranks locally and
  only k rows per query survive the final TakeOrdered.
- **near-dup blocking** uses a deterministic seeded coarse quantizer
  (cells picked by md5 order, assignment = nearest cells by cosine), so
  the pair space is bounded by ``n_cells``/``probes`` — never by a data
  column whose group sizes are unbounded at 100 TB. The same recipe is
  reproducible in any engine (the DuckDB oracle mirrors it literally).
- **IVF** splits index build (sample → numpy spherical k-means → one
  assignment pass, persisted) from search (probe nprobe cells, rank
  within). At 100 TB the build is one pass over the corpus and search
  touches ~nprobe/n_cells of it; training never runs per query.
- **LSH variant** buckets by random-hyperplane sign bits derived from
  md5 (deterministic across engines/runs), then searches within buckets.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from quackpipe_spark.operators.util import fan_out, plan_size_bytes


# score-matrix element budget for the probe kernel: 16M float64 ≈ 128 MB
# per in-flight tile. Without tiling the kernel held a full
# batch_rows × n_cells matrix — at an auto-derived n_cells for a 1B-row
# corpus (~2M cells) that is ~160 GB per 10k-row Arrow batch, an
# executor OOM that contradicted the module's own 100 TB story
# (review r14). Corpora whose n_cells fits the budget keep the original
# single-matmul path byte-for-byte.
_PROBE_TILE_ELEMS = 1 << 24


def _probe_order(
    M: np.ndarray,
    cells_np: np.ndarray,
    Cm: np.ndarray,
    Cn: np.ndarray,
    n_probes: int,
    round_to: int,
) -> np.ndarray:
    """THE quantizer-probe kernel: (rows, dims) matrix → (rows, n_probes)
    indexes into ``cells_np`` of each row's nearest centers by rounded
    cosine, ties broken on ascending cell id. One definition shared by
    assign_cells' UDF and the fused small-input kernel so the two
    size-gated physical paths can never drift in assignment semantics
    (same rounding, same tie-break).

    Large center sets evaluate in TILES under _PROBE_TILE_ELEMS,
    keeping a per-row running top-n pool: top-n of a union equals top-n
    of the union of per-tile top-ns under any total order, and the
    order here (rounded score desc, cell asc — tiles are disjoint in
    cell id) is total, so the tiled result is BIT-IDENTICAL to the
    single-matmul path."""
    nrm = np.maximum(np.linalg.norm(M, axis=1), 1e-300)
    n_rows, n_cells = len(M), len(cells_np)
    if n_rows == 0:
        return np.empty((0, min(n_probes, n_cells)), dtype=np.int64)
    if n_rows * n_cells <= _PROBE_TILE_ELEMS:
        scores = np.round((M @ Cm.T) / (nrm[:, None] * Cn[None, :]), round_to)
        return np.lexsort(
            (np.broadcast_to(cells_np, scores.shape), -scores), axis=1
        )[:, :n_probes]
    k = min(n_probes, n_cells)
    tile = max(k, _PROBE_TILE_ELEMS // max(n_rows, 1))
    rowar = np.arange(n_rows)[:, None]
    best_s = best_i = None
    for lo in range(0, n_cells, tile):
        hi = min(lo + tile, n_cells)
        s = np.round(
            (M @ Cm[lo:hi].T) / (nrm[:, None] * Cn[None, lo:hi]), round_to
        )
        kk = min(k, hi - lo)
        loc = np.lexsort(
            (np.broadcast_to(cells_np[lo:hi], s.shape), -s), axis=1
        )[:, :kk]
        cand_s, cand_i = s[rowar, loc], loc + lo
        if best_s is None:
            best_s, best_i = cand_s, cand_i
            continue
        all_s = np.concatenate([best_s, cand_s], axis=1)
        all_i = np.concatenate([best_i, cand_i], axis=1)
        order = np.lexsort((cells_np[all_i], -all_s), axis=1)[:, :k]
        best_s, best_i = all_s[rowar, order], all_i[rowar, order]
    return best_i


def _list_mat(arr) -> np.ndarray:
    """Arrow list<numeric> array (fixed row length, no nulls — callers
    filter ragged/null vectors upstream) → (n, dims) float64 matrix via
    the flat values buffer. ``flatten()`` honors slice offsets, so a
    sliced batch reshapes correctly.

    The contract is CHECKED, not assumed: ``flatten()`` silently DROPS
    a null row's slot and ``reshape(len, -1)`` still succeeds whenever
    the remaining value count happens to divide — one null or ragged
    vector would shear every subsequent row into a garbage matrix with
    no error (wrong cell assignments, wrong cosines). The old pandas
    path (``np.array(vecs.tolist())``) failed loudly on the same
    violation; this one must too."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError(
            f"_list_mat: embedding column has {arr.null_count} null row(s); "
            "callers must filter null vectors before the kernel"
        )
    flat = np.asarray(arr.flatten(), dtype=np.float64)
    if len(arr) == 0:
        return flat.reshape(0, 0)
    # exact per-row length check — a total that happens to divide (row
    # lengths 2,3,1 over 3 rows) would still reshape into garbage
    lens = np.asarray(arr.value_lengths(), dtype=np.int64)
    if lens.min() != lens.max():
        raise ValueError(
            f"_list_mat: ragged embedding column (row lengths "
            f"{lens.min()}..{lens.max()}); fixed row length is a precondition"
        )
    return flat.reshape(len(arr), -1)


def dot(a, b) -> Column:
    """Σ a_i·b_i in double (ordered fold → deterministic, engine-portable:
    DuckDB's list_sum(list_transform(...)) folds in the same order, so the
    doubles are bit-identical)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query vector (the correctness baseline).

    The query set is broadcast; norms are computed once per row BEFORE the
    pair join (pair space only pays the dot product); ranking keys round
    the cosine (reproducible across engines) and tie-break on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnorm"),
    )
    c = fan_out(corpus, bytes_per_task=8 << 20).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")),
                round_to,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


# --- deterministic seeded coarse quantizer ---------------------------------

Centers = list[tuple[int, list[float]]]


def auto_cells(corpus: DataFrame, target_rows_per_cell: int = 4096) -> int:
    """Scale-safe default cell count for the quantizer-blocked operators.

    Two constraints, take the max: ≥ 4× cluster parallelism (the
    within-cell stage runs one task per cell, so fewer cells caps the
    cluster), and ≤ ``target_rows_per_cell`` rows per cell so an
    O(cell²) pairwise score block stays executor-sized (4096² doubles =
    134 MB). One count() job is the price of a default that still holds
    at 1000× the corpus; gate queries pin n_cells explicitly instead so
    their oracle SQL (which inlines the literal) stays valid."""
    n = corpus.count()
    par = corpus.sparkSession.sparkContext.defaultParallelism
    return max(4 * par, -(-n // target_rows_per_cell))


def seeded_centers(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 32,
) -> Centers:
    """``n_cells`` quantizer centers picked deterministically from the data:
    the first ``n_cells`` vectors in md5(id) order (a pseudo-random but
    engine-reproducible sample — the DuckDB oracle selects the identical
    rows with ORDER BY md5(CAST(id AS VARCHAR))). Cell id = md5 rank.

    Collecting ``n_cells`` rows to the driver is the index-build step; the
    centers go back to executors as literals. No training loop — this is IVF
    with random init and zero Lloyd iterations, which is all a *blocking*
    quantizer needs (cells must be balanced-ish and stable, not optimal).
    """
    seeds = (
        # NULL vectors carry no geometry and previously crashed the
        # driver-side float() loop with a bare TypeError whenever one
        # ranked into the seed window (review r14) — the quantizer
        # samples only real vectors; downstream assignment kernels keep
        # their own loud null checks (_list_mat)
        corpus.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string").cast("binary")))
        .limit(n_cells)
        .collect()
    )
    return [(i + 1, [float(x) for x in r[vec_col]]) for i, r in enumerate(seeds)]


def assign_cells(
    df: DataFrame,
    centers: Centers,
    id_col: str,
    vec_col: str,
    probes: int = 1,
    round_to: int = 6,
    carry_probes: bool = False,
    with_norm: bool = True,
) -> DataFrame:
    """(id, vec, nrm, cell) rows — each vector assigned to its ``probes``
    nearest centers by cosine (rounded, tie-broken on cell id); with
    ``carry_probes`` the full probe array rides along as ``pcells``.
    ``with_norm=False`` drops the ``nrm`` column for consumers that can
    re-derive the identical sequential fold downstream (blocked_near_pairs
    reads it off diag(S)) — the fold is a 64-step Catalyst expression per
    row, so skipping it shrinks both the compiled plan and the shuffle.

    The scoring is one numpy matmul per Arrow batch against the driver-side
    center literals — no crossJoin row blowup, no shuffle, no window
    (measured 3× faster than the crossJoin+rank plan, and the former
    multiplies the corpus ×n_cells through a shuffle, which is the real
    100 TB hazard). ``nrm`` stays the sequential JVM fold so every exact
    cosine computed downstream is bit-identical to the DuckDB oracle's
    list_sum fold; only the CELL CHOICE uses BLAS summation, whose last-ulp
    difference survives the round() only if two scores straddle the same
    1e-{round_to} rounding edge within ~1e-15 (never observed on the test
    corpora; acceptable for a blocking/probing decision)."""

    cells_np = np.array([c for c, _ in centers], dtype=np.int64)
    Cm = np.array([v for _, v in centers], dtype=np.float64)
    Cn = np.maximum(np.linalg.norm(Cm, axis=1), 1e-300)
    n_probes = min(probes, len(centers))

    @F.arrow_udf("array<int>")
    def _topcells(vecs: pa.Array) -> pa.Array:
        # arrow_udf, not pandas_udf: the list<double> column reaches numpy
        # via a flat buffer reshape instead of a per-row python-list
        # round-trip (~0.05 s per boundary at gate scale, linear at real
        # scale); the float64 matrix — and therefore every score and cell
        # choice — is bit-identical to the pandas path's
        if len(vecs) == 0:
            return pa.array([], type=pa.list_(pa.int32()))
        order = _probe_order(_list_mat(vecs), cells_np, Cm, Cn, n_probes, round_to)
        return pa.array(
            [cells_np[o].astype("int32").tolist() for o in order],
            type=pa.list_(pa.int32()),
        )

    # the explode below carries an implicit size>0 filter; on a
    # deterministic UDF Catalyst collapses that filter INTO the
    # projection and evaluates the UDF twice per row (two
    # ArrowEvalPython stages, verified in the formatted plan). The
    # function IS deterministic — the marker only forbids Catalyst
    # from re-evaluating it, halving the assignment stage.
    _topcells = _topcells.asNondeterministic()

    nrm_cols = [norm(F.col(vec_col)).alias("nrm")] if with_norm else []
    if carry_probes:
        # keep each row's full probe list alongside the exploded cell:
        # downstream pair stages can then decide "is this cell the pair's
        # canonical (minimum shared) cell?" locally, instead of paying a
        # global distinct shuffle over the emitted pair set
        return df.select(
            F.col(id_col),
            F.col(vec_col),
            *nrm_cols,
            _topcells(F.col(vec_col)).alias("pcells"),
        ).select("*", F.explode("pcells").alias("cell"))
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        *nrm_cols,
        F.explode(_topcells(F.col(vec_col))).alias("cell"),
    )


def blocked_near_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_cells: int | None = None,
    probes: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """Near-duplicate pairs blocked by quantizer cell: only pairs sharing
    one of their ``probes`` nearest cells are compared, so the pair space
    is ~n²·probes²/n_cells regardless of any data column's skew (blocking
    on a value column like ``label`` is unbounded — one hot label and the
    block is quadratic). Multi-probe assignment recovers pairs that
    straddle a cell boundary. Exact cosine ≥ threshold verifies every
    candidate, so precision is exact; recall is the standard IVF trade-off
    tuned by (n_cells, probes).

    The within-cell scoring is ONE applyInPandas pass: each cell's rows
    arrive as an Arrow batch (linear in corpus size — never the pair
    space) and all pairwise dots are computed as ``dims`` vectorized
    rank-1 accumulations in numpy. Accumulation runs in ascending
    dimension order on float64, so every cosine is BIT-IDENTICAL to the
    sequential JVM/DuckDB list-fold the oracle uses — vectorized across
    pairs, not reordered within one. (A previous version self-joined the
    assignment and paid an interpreted 64-step fold per pair: ~3× slower
    at equal results, plus a persist to stop double-computation.)

    Scale: ``n_cells`` bounds BOTH the pair space (≈ n²·probes²/n_cells)
    and the stage's parallelism (one task per cell), so it must grow with
    the corpus; the default (None) derives it via :func:`auto_cells` —
    ≥ 4× cluster parallelism and small enough per-cell rows that the
    O(cell²) score matrix fits an executor. Oversized hot cells are the
    quantizer's skew case: raise n_cells or probes rather than salting,
    which cannot split an all-pairs block without a triangle join."""

    if n_cells is None:
        n_cells = auto_cells(corpus)
    centers = seeded_centers(corpus, id_col, vec_col, n_cells)
    # emit with slack below threshold, round+filter JVM-side: np.round is
    # half-to-even while Spark/DuckDB round() is half-up, so the EXACT
    # rounding that decides threshold membership must not happen in numpy
    slack = threshold - 10.0 ** (-round_to) / 2 - 1e-12
    id_t = dict(corpus.dtypes)[id_col]
    out_schema = f"a {id_t}, b {id_t}, _rawcos double"
    # ONE assignment-rounding constant feeds both physical paths (the
    # fused kernel and assign_cells) — they share _probe_order, so the
    # size gate can never change which cell a vector lands in
    assign_round_to = 6

    sz = plan_size_bytes(corpus)
    # The fused path's cost is QUADRATIC per cell (the r10 scale run
    # measured 0.46s→69s at 20× data with pinned cells: a bytes-only
    # gate serialized ~25 Gflops of pair scoring onto one core), so the
    # gate bounds estimated pairwise WORK, not input bytes: rows are
    # over-estimated from vector bytes alone (sz / 4·dims — the true row
    # is wider, so the estimate errs toward the distributed path), and
    # the fused kernel runs only when per_cell² · n_cells · dims stays
    # well under one core-second.
    fused_ok = False
    if sz is not None and sz < (32 << 20) and centers:
        dims = len(centers[0][1])
        rows_est = sz / max(1, 4 * dims)
        per_cell = rows_est * probes / max(1, n_cells)
        fused_ok = per_cell * per_cell * n_cells * dims <= 2**28
    if fused_ok:
        # FUSED serial path for tiny inputs: coalesce(1) + ONE mapInArrow
        # kernel doing assignment AND per-cell pair scoring — zero
        # exchanges and one Python stage instead of two (each boundary is
        # ~0.15-0.2 s of fixed cost at gate scale). Same spirit as the
        # 8-task Arrow cap this replaces: inert at real scale, where the
        # distributed path below runs. The kernel iterates the SAME
        # per-cell blocks (_pair_block) the distributed path shuffles
        # into, so the emitted pair set is identical by construction.
        scored = _near_pairs_fused(
            corpus, centers, id_col, vec_col, probes, slack, out_schema,
            assign_round_to,
        )
    else:
        assigned = assign_cells(
            fan_out(corpus, skip_under_bytes=32 << 20),
            centers,
            id_col,
            vec_col,
            probes=probes,
            round_to=assign_round_to,
            carry_probes=True,
            with_norm=False,  # re-derived bit-identically from diag(S)
        )

        def _cell_pairs(tbl: pa.Table) -> pa.Table:
            pa_id_t = tbl.schema.field(id_col).type
            target = pa.schema(
                [("a", pa_id_t), ("b", pa_id_t), ("_rawcos", pa.float64())]
            )
            if tbl.num_rows < 2:
                return target.empty_table()
            ids = np.asarray(tbl[id_col].to_pylist())
            order = np.argsort(ids, kind="stable")  # id order → a < b
            pcs = [set(x) for x in tbl["pcells"].to_pylist()]
            a, b, cos = _pair_block(
                ids[order],
                _list_mat(tbl[vec_col])[order],
                [pcs[o] for o in order],
                tbl["cell"][0].as_py(),
                slack,
            )
            return pa.table(
                {"a": pa.array(a), "b": pa.array(b), "_rawcos": pa.array(cos)}
            ).cast(target)

        # never more cell-stage partitions than cells: the stage has at
        # most n_cells groups, so extra partitions are pure task/Arrow
        # overhead (at real scale n_cells ≥ 4×par and this pins
        # partitions = par); the explicit hash exchange on cell also
        # satisfies the groupBy's clustering, so no second exchange
        # follows.
        par = corpus.sparkSession.sparkContext.defaultParallelism
        scored = (
            assigned.repartition(min(par, n_cells), "cell")
            .groupBy("cell")
            .applyInArrow(_cell_pairs, schema=out_schema)
        )
    return scored.select(
        "a", "b", F.round(F.col("_rawcos"), round_to).alias("cos")
    ).filter(
        F.col("cos") >= threshold
    )  # already distinct: each pair was emitted only from its canonical cell


def _pair_block(ids, M, pcs, cell, slack):
    """All near pairs of one cell's members. Inputs are id-SORTED
    (position order = id order → emitted a < b); ``pcs`` is each member's
    full probe-cell set. Shared verbatim by the distributed cell stage
    and the fused serial kernel so both paths emit the identical set.

    Ascending-dim rank-1 accumulation: diag(S) IS the sequential fold of
    x², so norms — and every cosine — are bit-identical to the JVM
    aggregate / DuckDB list_sum fold (vectorized across pairs, never
    reordered within one).

    Canonical-cell dedup: a pair sharing BOTH probe cells would be
    emitted twice; emit only from the pair's minimum shared cell so the
    result needs no global distinct (one whole shuffle of the pair set
    saved — the pair set is the big thing at scale).

    r12 kernel: the accumulation is TILED over 64-row blocks of a
    transposed copy — each S tile stays L2-resident across all ``dims``
    sweeps instead of streaming the full p×p matrix through DRAM per
    dimension (measured 3.3× on a 1024-row cell), and every S[i,j] still
    folds in ascending-dim order, so results are bit-identical. The
    canonical-cell check is k² vectorized comparisons over the padded
    probe-cell matrix (k = probes), replacing a Python set-intersection
    loop over every kept pair."""
    p = len(ids)
    dims = M.shape[1]
    MT = np.ascontiguousarray(M.T)
    S = np.empty((p, p))
    blk_rows = 64
    for i0 in range(0, p, blk_rows):
        hi = min(i0 + blk_rows, p)
        blk = np.zeros((hi - i0, p))
        for d in range(dims):
            blk += MT[d, i0:hi][:, None] * MT[d][None, :]
        S[i0:hi] = blk
    nr = np.sqrt(np.diag(S))
    C = S / (nr[:, None] * nr[None, :])
    ai, bi = np.triu_indices(p, 1)
    keep = C[ai, bi] >= slack
    ai, bi, cos = ai[keep], bi[keep], C[ai, bi][keep]
    huge = np.iinfo(np.int64).max
    kmax = max((len(s) for s in pcs), default=0)
    P = np.full((p, kmax), huge, dtype=np.int64)
    for r, s in enumerate(pcs):
        row = sorted(s)
        P[r, : len(row)] = row
    m = np.full(len(ai), huge, dtype=np.int64)
    for x in range(kmax):
        ax = P[ai, x]
        for y in range(kmax):
            hit = (ax == P[bi, y]) & (ax != huge)
            np.minimum(m, np.where(hit, ax, huge), out=m)
    emit = m == cell
    return ids[ai[emit]], ids[bi[emit]], cos[emit]


def _near_pairs_fused(
    corpus: DataFrame,
    centers: Centers,
    id_col: str,
    vec_col: str,
    probes: int,
    slack: float,
    out_schema: str,
    round_to: int,
) -> DataFrame:
    """Single-task fused assign+score for sub-32MB inputs (see
    blocked_near_pairs). Assignment rides the SHARED _probe_order kernel
    (same rounding, same tie-break as assign_cells); each cell block then
    goes through the shared _pair_block, so the output matches the
    distributed path pair-for-pair."""

    cells_np = np.array([c for c, _ in centers], dtype=np.int64)
    Cm = np.array([v for _, v in centers], dtype=np.float64)
    Cn = np.maximum(np.linalg.norm(Cm, axis=1), 1e-300)
    n_probes = min(probes, len(centers))

    def _fused(batches):
        bl = list(batches)
        if not bl:
            return
        tbl = pa.Table.from_batches(bl)
        pa_id_t = tbl.schema.field(id_col).type
        target = pa.schema(
            [("a", pa_id_t), ("b", pa_id_t), ("_rawcos", pa.float64())]
        )
        if tbl.num_rows < 2:
            return
        ids_all = np.asarray(tbl[id_col].to_pylist())
        M_all = _list_mat(tbl[vec_col])
        order_pc = _probe_order(M_all, cells_np, Cm, Cn, n_probes, round_to)
        pcs_all = [set(cells_np[o].tolist()) for o in order_pc]
        outs = []
        for cell in sorted({c for s in pcs_all for c in s}):
            idx = np.nonzero(
                np.fromiter((cell in s for s in pcs_all), bool, count=len(pcs_all))
            )[0]
            if len(idx) < 2:
                continue
            sub = idx[np.argsort(ids_all[idx], kind="stable")]
            a, b, cos = _pair_block(
                ids_all[sub], M_all[sub], [pcs_all[j] for j in sub], cell, slack
            )
            if len(a):
                outs.append((a, b, cos))
        if not outs:
            return
        out = pa.table(
            {
                "a": pa.array(np.concatenate([o[0] for o in outs])),
                "b": pa.array(np.concatenate([o[1] for o in outs])),
                "_rawcos": pa.array(np.concatenate([o[2] for o in outs])),
            }
        ).cast(target)
        yield from out.to_batches()

    return corpus.select(id_col, vec_col).coalesce(1).mapInArrow(
        _fused, out_schema
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    n_cells: int | None = None,
    probes: int = 2,
    edge_bound: int | None = None,
    small_graph_edges: int = 1 << 20,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): drop documents that are
    *semantically* near-identical even when their text differs — pairs
    with embedding cosine ≥ ``threshold`` close into connected
    components (operators/cluster.py), and each component keeps its
    minimum id. Returns ``corpus`` plus (component, is_canonical);
    filter ``is_canonical`` for the deduplicated corpus.

    The closure matters here more than for text dedup: cosine
    similarity is not transitive, so chains A≈B≈C with cos(A,C) below
    threshold are common, and pair-local dropping would keep both ends
    of every chain. Scale shape: pairs come from the quantizer-blocked
    single-pass scorer (see blocked_near_pairs — pair space bounded by
    n_cells, never all-pairs), the component labels are tiny relative
    to the corpus (dup rate × n), and the final annotate join
    broadcasts them."""
    pairs = blocked_near_pairs(
        corpus, id_col, vec_col, threshold, n_cells, probes
    ).select("a", "b")
    from quackpipe_spark.operators.cluster import cluster_near_dups

    return cluster_near_dups(
        corpus,
        pairs,
        id_col=id_col,
        edge_bound=edge_bound,
        small_graph_edges=small_graph_edges,
    )


def prototype_sample(
    corpus: DataFrame,
    per_cell: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    keep: str = "far",
) -> DataFrame:
    """Embedding-space diversity/prototypicality selection (the D4 /
    SSL-prototypes recipe, public): quantize the corpus into cells, rank
    each cell's members by cosine to their cell center, and keep
    ``per_cell`` rows — ``keep="far"`` keeps the LEAST prototypical
    (removes the easy near-center redundancy, the diversity-preserving
    pruning in the papers), ``keep="near"`` keeps the archetypes.
    Ties (and the final order) break on id, so the selection is
    deterministic given the corpus.

    Scale shape: cell assignment is the same broadcast-centers
    projection every IVF path uses (no shuffle on the corpus beyond the
    fan_out), and the ranking is one window per cell — cells are
    auto-sized (auto_cells) so no window partition exceeds a few
    thousand rows at any corpus size."""
    if per_cell < 1:
        raise ValueError("per_cell must be >= 1")
    if keep not in ("far", "near"):
        raise ValueError("keep must be 'far' or 'near'")
    _check_output_collisions(corpus, ("cell", "cos_to_center"), "prototype_sample")
    if n_cells is None:
        n_cells = auto_cells(corpus)
    centers = seeded_centers(corpus, id_col, vec_col, n_cells)
    assigned = assign_cells(
        fan_out(corpus, bytes_per_task=8 << 20), centers, id_col, vec_col, probes=1
    )
    import math

    # center norms are constants known driver-side: precompute them into
    # the broadcast frame instead of re-folding norm(_cvec) — a dims-step
    # aggregate expression — for EVERY corpus row (review r12; ~2× the
    # per-row fold work of the scoring stage at 64 dims)
    def _pynorm(v: list) -> float:
        # the exact ordered fold norm() computes (acc + x*x ascending,
        # then sqrt) so the precomputed constant is bit-identical to the
        # expression it replaces
        acc = 0.0
        for x in v:
            acc = acc + float(x) * float(x)
        return math.sqrt(acc)

    centers_df = corpus.sparkSession.createDataFrame(
        [(int(c), [float(x) for x in v], _pynorm(v)) for c, v in centers],
        "cell int, _cvec array<double>, _cnorm double",
    )
    cos = F.round(
        dot(F.col(vec_col), F.col("_cvec")) / (F.col("nrm") * F.col("_cnorm")),
        6,
    ).alias("cos_to_center")
    scored = assigned.join(F.broadcast(centers_df), "cell").select(
        id_col, "cell", cos
    )
    ord_col = (
        F.col("cos_to_center").asc()
        if keep == "far"
        else F.col("cos_to_center").desc()
    )
    w = Window.partitionBy("cell").orderBy(ord_col, F.col(id_col))
    picked = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= per_cell)
        .select(id_col, "cell", "cos_to_center")
    )
    return corpus.join(picked, id_col)


def _check_output_collisions(df: DataFrame, added: tuple[str, ...], who: str) -> None:
    """Refuse output-column collisions loudly: joining helper columns
    onto a corpus that already carries same-named ones yields duplicate
    columns whose later reference throws AMBIGUOUS_REFERENCE far from
    the cause (review r14)."""
    clash = [c for c in added if c in df.columns]
    if clash:
        raise ValueError(
            f"{who} adds column(s) {clash} but the input already has "
            "them — rename or drop before calling"
        )


# --- IVF (build once, search many) -----------------------------------------

@dataclass
class IvfIndex:
    """A built IVF index: persisted cell assignments + centroid literals.

    ``assigned`` is the corpus with (neighbor_id, cvec, cnorm, cell) —
    at 100 TB this is the materialized index one writes back to parquet
    partitioned by cell; here it stays a persisted DataFrame."""

    centers: Centers
    assigned: DataFrame

    def unpersist(self) -> None:
        self.assigned.unpersist()


def build_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    seed: int = 42,
    sample_n: int = 10_000,
    iters: int = 8,
) -> IvfIndex:
    """Build the IVF coarse quantizer + assignment ONCE (the index step).

    Train on a bounded driver-side sample with numpy spherical k-means
    (the FAISS recipe: quantizers train on a subset, never the full
    corpus) — a distributed take of ``sample_n`` rows + a few ms of
    numpy, instead of per-iteration distributed jobs for a small-cell
    model. The sample is the first ``sample_n`` rows in md5(id) order
    (the same recipe as seeded_centers/train_pq): a bare
    ``limit(sample_n)`` is partition-layout-dependent, so re-indexing
    the same corpus after a repartition or file compaction trained on
    DIFFERENT vectors and produced different centroids despite the seed
    (review r12). ``n_cells=None`` sizes the cell count to the corpus
    and the cluster via :func:`auto_cells` (clamped to sample_n: k-means
    can't make more centers than training rows). The full corpus is
    touched exactly once, by the assignment pass.
    """
    if n_cells is None:
        n_cells = min(auto_cells(corpus), sample_n)
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string").cast("binary")))
        .limit(sample_n)
        .select(vec_col)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # spherical: max cosine
        for j in range(C.shape[0]):
            m = assign == j
            if m.any():
                c = X[m].mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    centers = [(j + 1, [float(x) for x in C[j]]) for j in range(C.shape[0])]
    return _assigned_index(corpus, centers, id_col, vec_col)


def _assigned_index(
    corpus: DataFrame, centers: "Centers", id_col: str, vec_col: str
) -> "IvfIndex":
    """Shared back half of both index builders: one full-corpus
    assignment pass, persisted eagerly (search must never re-run it).
    Single-sourced so the eager-persist discipline and the postings
    column contract can't drift between the trained and seeded paths."""
    assigned = (
        assign_cells(fan_out(corpus, bytes_per_task=8 << 20), centers, id_col, vec_col, probes=1)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cvec"),
            F.col("nrm").alias("cnorm"),
            "cell",
        )
        .persist()
    )
    assigned.count()
    return IvfIndex(centers=centers, assigned=assigned)


def build_seeded_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
) -> IvfIndex:
    """Zero-iteration IVF: the coarse quantizer is the deterministic
    md5-seeded center set (:func:`seeded_centers`) instead of a trained
    k-means — random-init IVF-flat, the FAISS degenerate case that is
    already a valid blocking quantizer (cells stable and balanced-ish,
    not optimal). Because the centers are derivable from the data alone
    by ANY engine, a search over this index is fully oracle-checkable:
    the DuckDB mirror re-derives the identical index and must reproduce
    the same approximate result set bit-for-bit. Same build shape as
    :func:`build_ivf_index` — one bounded driver collect for centers,
    one full-corpus assignment pass, persisted."""
    centers = seeded_centers(corpus, id_col, vec_col, n_cells)
    return _assigned_index(corpus, centers, id_col, vec_col)


def write_ivf_index(index: IvfIndex, path: str) -> None:
    """Materialize a built index to storage: the postings (corpus rows with
    precomputed norms) land as parquet PARTITIONED BY cell — a search that
    probes nprobe cells then reads only those directories (partition
    pruning), which is the on-disk analogue of the persisted-DataFrame
    bucket join. The centroids are a second (tiny) parquet table. At
    100 TB the postings write is the index's one full-corpus pass; every
    later session pays only `load` (centers collect + lazy scan)."""
    spark = index.assigned.sparkSession
    # repartition on the partition column first: a direct partitionBy
    # write emits one file per (task × cell) — at 1000 executors that is
    # n_cells×1000 tiny files and every later probe pays the listing;
    # hash-clustering by cell bounds it to one file per cell dir (r14)
    index.assigned.repartition("cell").write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(f"{path}/postings")
    spark.createDataFrame(
        [(c, v) for c, v in index.centers], "cell INT, center ARRAY<DOUBLE>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centers")


def load_ivf_index(spark, path: str, pin: bool = True) -> IvfIndex:
    """Reopen a written index. ``pin=True`` persists+counts the postings
    (a serving session searching many times); ``pin=False`` leaves the scan
    lazy so a single search reads only its probed cell partitions."""
    centers = sorted(
        (r["cell"], [float(x) for x in r["center"]])
        for r in spark.read.parquet(f"{path}/centers").collect()
    )
    assigned = spark.read.parquet(f"{path}/postings").select(
        "neighbor_id", "cvec", "cnorm", F.col("cell").cast("int").alias("cell")
    )
    if pin:
        assigned = assigned.persist()
        assigned.count()
    return IvfIndex(centers=centers, assigned=assigned)


def ivf_search(
    index: IvfIndex,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    round_to: int = 6,
    broadcast_max_rows: int = 1_000_000,
) -> DataFrame:
    """Search a built index: probe each query's ``nprobe`` nearest cells,
    rank only vectors in those cells (compared fraction ≈ nprobe/n_cells).

    The probed query frame broadcasts only when the query set is
    verifiably under ``broadcast_max_rows`` probed rows: this IS the
    documented path for large distributed query frames, and an
    unconditional F.broadcast of queries × nprobe rows of full vectors
    was a forced driver collect / executor OOM at ~10M+ queries (review
    r12). The gate is dedup's _probe_hint — it counts only frames whose
    lineage is scan-shaped or cached (a full count of an expensive
    derived query frame would run its pipeline twice just to decide a
    hint; such frames take the no-hint path, where AQE still broadcasts
    at runtime if the executed size turns out small). Oversized or
    uncountable query sets fall back to a shuffle join on cell."""
    # probe selection = the same literal-centers assignment as the build
    # side (numpy per Arrow batch, no crossJoin/window); norms come back
    # precomputed so pair scoring pays only the dot.
    probed = assign_cells(
        # round_to forwarded: probe selection must round at the SAME
        # precision as ivf_search_rows' driver-side mirror, or the two
        # serving paths probe different cells for non-default round_to
        # (review r14)
        queries, index.centers, id_col, vec_col, probes=nprobe,
        round_to=round_to,
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("nrm").alias("_qnorm"),
        "cell",
    )
    from quackpipe_spark.operators.dedup import _probe_hint

    probed = _probe_hint(probed, queries, broadcast_max_rows // max(nprobe, 1))
    scored = (
        index.assigned.join(probed, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qvec"), F.col("cvec")) / (F.col("_qnorm") * F.col("cnorm")),
                round_to,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


# Probe-literal plan-size bound for ivf_search_rows: the flat probe list
# inlines ≈ batch×nprobe query vectors as plan literals, so a wide batch
# pushed through the rows API bloats the logical plan (64-dim doubles ≈
# 0.5 KB/probe as literals) and every analysis/codegen pass pays for it.
# 4096 probes ≈ 2 MB of literals — comfortably a "small serving batch";
# beyond it the distributed path is structurally better anyway (the
# vectors ship as DATA, not plan).
IVF_ROWS_MAX_PROBE_LITERALS = 4096


def ivf_search_rows(
    index: IvfIndex,
    query_rows: list[tuple],
    k: int = 10,
    nprobe: int = 4,
    round_to: int = 6,
    max_probe_literals: int | None = IVF_ROWS_MAX_PROBE_LITERALS,
) -> DataFrame:
    """Small-query-batch serving path over a built index: probes are
    computed DRIVER-side in numpy (the FAISS client-side query-planning
    model) instead of shipping a handful of vectors through a pandas-UDF
    stage, and the probed cells become a STATIC ``cell IN (...)`` filter
    — on a written index (write_ivf_index layout) that is plain
    partition pruning. The probe batch itself is inlined as a literal
    cell→[query struct] map exploded scan-side (the pq_topk_multi
    discipline): no broadcast exchange, no join, no extra job — the whole
    search is one pruned scan plus the per-query top-k window's single
    exchange. Use :func:`ivf_search` when the query set is itself a
    large distributed frame.

    ``query_rows`` = [(query_id, vector)] with non-null, equal-length
    vectors (collect the frame first; ids must be int or str).

    ``max_probe_literals`` bounds the inlined plan size: a batch whose
    flat probe list (≈ batch × nprobe) would exceed it is routed to the
    distributed :func:`ivf_search` automatically (the rows become a tiny
    DataFrame; results are IDENTICAL — both paths share assign_cells'
    rounded probe choice and the sequential-fold query norm, pinned by
    tests). Wide batches through the rows API previously inlined an
    unbounded literal map — a plan-bloat cliff the per-call analysis
    cost pays for (deferred in PLAN_AUDIT_r14, closed r15). ``None``
    disables the bound (not recommended).

    Parity discipline (hash-checked by the driver gate): the probe
    scoring mirrors assign_cells exactly — np.round(cos, round_to),
    tie-break on ascending cell id; the query norm reused in the exact
    cosine is a SEQUENTIAL python float fold, bit-identical to the JVM
    aggregate fold and DuckDB's list_sum over the same doubles (BLAS
    norms enter only the probe CHOICE, where round_to absorbs ulp noise
    — the assign_cells contract)."""
    import math

    if not query_rows:
        # empty literals would fail analysis with a cryptic VOID-type
        # element_at error; fail like pq_topk_multi does
        raise ValueError("query_rows must be non-empty")
    if (
        max_probe_literals is not None
        and len(query_rows) * min(nprobe, len(index.centers))
        > max_probe_literals
    ):
        # wide batch: route to the distributed path instead of inlining
        # an unbounded literal map into the plan (see docstring)
        spark = index.assigned.sparkSession
        id_t_route = dict(index.assigned.dtypes)["neighbor_id"]
        qdf = spark.createDataFrame(
            [(qid, [float(x) for x in vec]) for qid, vec in query_rows],
            schema=f"vec_id {id_t_route}, embedding array<double>",
        )
        return ivf_search(
            index, qdf, "vec_id", "embedding",
            k=k, nprobe=nprobe, round_to=round_to,
        )
    cells_np = np.array([c for c, _ in index.centers], dtype=np.int64)
    Cm = np.array([v for _, v in index.centers], dtype=np.float64)
    Cn = np.maximum(np.linalg.norm(Cm, axis=1), 1e-300)
    n_probes = min(nprobe, len(index.centers))
    id_t = dict(index.assigned.dtypes)["neighbor_id"]
    by_cell: dict[int, list] = {}
    for qid, vec in query_rows:
        v = np.asarray(vec, dtype=np.float64)
        nrm_blas = max(float(np.linalg.norm(v)), 1e-300)
        scores = np.round((Cm @ v) / (nrm_blas * Cn), round_to)
        order = np.lexsort((cells_np, -scores))[:n_probes]
        s = 0.0
        for x in v.tolist():  # sequential fold: JVM/list_sum bit-parity
            s += x * x
        seq_nrm = math.sqrt(s)
        for c in cells_np[order].tolist():
            by_cell.setdefault(int(c), []).append((qid, vec, seq_nrm))
    probe_cells = sorted(by_cell)

    # literals as PARALLEL ARRAYS, each a single nested F.lit (one py4j
    # hop apiece): per-element F.lit would cost a roundtrip each (~1.3k
    # for a 20-probe batch ≈ 1s of pure driver latency), and a rendered
    # SQL map-of-structs literal costs a ~30KB ANTLR parse per call. The
    # flat probe list is indexed positionally: cell → [1-based probe
    # indexes], then each scan row explodes only its own cell's indexes.
    flat = [t for c in probe_cells for t in by_cell[c]]
    idx_of: dict[int, list[int]] = {}
    pos = 1
    for c in probe_cells:
        idx_of[c] = list(range(pos, pos + len(by_cell[c])))
        pos += len(by_cell[c])
    qids_lit = F.lit([qid for qid, _, _ in flat])
    qvecs_lit = F.lit([[float(x) for x in vec] for _, vec, _ in flat])
    qnorms_lit = F.lit([float(n) for _, _, n in flat])
    cell_idx_map = F.map_from_arrays(
        F.lit(probe_cells), F.lit([idx_of[c] for c in probe_cells])
    )
    scored = (
        index.assigned.filter(F.col("cell").cast("int").isin(probe_cells))
        .select(
            "neighbor_id",
            "cvec",
            "cnorm",
            F.explode(
                F.element_at(cell_idx_map, F.col("cell").cast("int"))
            ).alias("_j0"),
        )
        .select(
            F.col("_j0").cast("int").alias("_j"),
            "neighbor_id",
            "cvec",
            "cnorm",
        )
        .select(
            F.element_at(qids_lit, F.col("_j")).cast(id_t).alias("query_id"),
            "neighbor_id",
            "cvec",
            "cnorm",
            "_j",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.element_at(qvecs_lit, F.col("_j")), F.col("cvec"))
                / (F.element_at(qnorms_lit, F.col("_j")) * F.col("cnorm")),
                round_to,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    round_to: int = 6,
) -> DataFrame:
    """Convenience build+search (tests / one-shot callers). Long-lived
    engines should call build_ivf_index once and ivf_search per query."""
    index = build_ivf_index(corpus, id_col, vec_col, n_cells=n_cells, seed=seed)
    return ivf_search(index, queries, id_col, vec_col, k=k, nprobe=nprobe, round_to=round_to)


def hyperplane_buckets(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (the scale path).

    Hyperplane p's component for dimension i is a deterministic ±1 from
    md5(p|i) — reproducible everywhere with no stored model. sign bit p =
    (Σ_i v_i·h_pi) ≥ 0; bucket = Σ bit_p<<p. Cosine-near vectors agree on
    most sign bits, so candidate search = same-bucket (or near-bucket)
    membership.

    Vectors that are NULL or not exactly ``dims`` long are EXCLUDED up
    front: zip_with would NULL-pad a short vector, the fold accumulator
    would go NULL, and the row would silently vanish from every bucket
    join downstream — an explicit filter makes the drop deterministic
    and visible in the plan (the gate queries apply the same contract on
    the oracle side)."""
    import hashlib

    corpus = corpus.filter(
        F.col(vec_col).isNotNull()
        & (F.size(vec_col) == dims)
        # a NULL ELEMENT inside a correct-length vector NULLs every
        # projection, and `when(proj >= 0).otherwise(0)` then routed the
        # row into bucket 0 — a VALID bucket, where it scored NULL
        # cosines yet still took top-k ranks (review r14); drop it
        # explicitly like the other malformed shapes
        & ~F.exists(F.col(vec_col), lambda x: x.isNull())
    )
    v = F.col(vec_col)

    def plane_sign(plane: int, i: int) -> float:
        # ±1 component i of hyperplane p = low bit of md5('{p}|{i}') —
        # computed DRIVER-side once and inlined as a literal array, so the
        # executor does a plain fold instead of re-hashing per row (same
        # values any engine would derive from the same recipe).
        return 1.0 if hashlib.md5(f"{plane}|{i}".encode()).digest()[-1] & 1 else -1.0

    # All n_planes projections in ONE pass over the vector: fold with an
    # n_planes-wide accumulator against a dims×n_planes literal sign matrix
    # (one fold of dims steps ~ n_planes× fewer array traversals than a fold
    # per plane). Per plane p the partial sums still accumulate in i order,
    # so the doubles are bit-identical to the per-plane fold.
    signs_by_dim = F.array(
        *[
            F.array(*[F.lit(plane_sign(p, i)) for p in range(n_planes)])
            for i in range(dims)
        ]
    )
    projs = F.aggregate(
        F.zip_with(
            v,
            signs_by_dim,
            lambda x, srow: F.transform(srow, lambda s: x.cast("double") * s),
        ),
        F.array(*[F.lit(0.0)] * n_planes),
        lambda acc, contrib: F.zip_with(acc, contrib, lambda a, c: a + c),
    )
    bucket = F.aggregate(
        F.zip_with(
            projs,
            F.array(*[F.lit(1 << p) for p in range(n_planes)]),
            lambda proj, w: F.when(proj >= 0, w).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return corpus.select(F.col(id_col), v.alias(vec_col), bucket.cast("int").alias("bucket"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    round_to: int = 6,
    dims: int = 64,
    broadcast_max_rows: int = 1_000_000,
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket.

    At 100 TB the bucket join replaces the broadcast-cross-product; with
    2^n_planes buckets the compared fraction is ~2^-n_planes (recall is
    tunable via n_planes / multi-probe). The query side broadcasts only
    when verifiably under ``broadcast_max_rows`` (the same _probe_hint
    gate ivf_search uses — an unconditional F.broadcast of a 10M-query
    frame of full vectors was a forced driver collect, the exact OOM
    class the r12 review closed on the IVF path; review r14)."""
    # norms once per row BEFORE the bucket join (the brute_force_topk
    # pattern): the pair space pays one dot, not dot + two norm re-folds.
    cb = hyperplane_buckets(
        fan_out(corpus, bytes_per_task=8 << 20), id_col, vec_col, n_planes, dims
    ).withColumn(
        "_cnorm", norm(F.col(vec_col))
    )
    qb = hyperplane_buckets(queries, id_col, vec_col, n_planes, dims).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        "bucket",
        norm(F.col(vec_col)).alias("_qnorm"),
    )
    from quackpipe_spark.operators.dedup import _probe_hint

    qb = _probe_hint(qb, queries, broadcast_max_rows)
    scored = (
        cb.join(qb, "bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                dot(F.col("qvec"), F.col(vec_col)) / (F.col("_qnorm") * F.col("_cnorm")),
                round_to,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


# --- Product quantization (the 100 TB memory path) --------------------------

@dataclass
class PqCodebooks:
    """Trained PQ codebooks: ``m`` contiguous subspaces of ``dsub`` dims,
    each quantized by ``k`` centers. Vectors are unit-normalized before
    encoding, so the ADC inner product approximates COSINE directly."""

    m: int
    dsub: int
    k: int
    centers: list[list[list[float]]]  # [m][k][dsub]

    @property
    def dim(self) -> int:
        return self.m * self.dsub


def train_pq(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    sample: int = 10_000,
    iters: int = 8,
) -> PqCodebooks:
    """Train PQ codebooks on a bounded, DETERMINISTIC sample.

    Why PQ at all: a 100 TB float32 embedding corpus cannot be held (or
    even scanned cheaply) raw — PQ stores ``m`` small codes per vector
    (m bytes at k≤256) instead of dim×4 bytes, a 16-64× compression,
    and search scores codes against a per-query lookup table without
    touching any float vector. This is the standard IVF-PQ memory
    layout (Jégou et al. 2011, public).

    Training is driver-side numpy k-means per subspace over ≤``sample``
    vectors picked in md5(id) order (engine-reproducible, the
    seeded_centers discipline; ties in assignment break toward the
    lower center index, so retraining is bit-stable). Bounded collect
    is the contract — codebook training on a sample is how PQ is used
    at any scale; the full corpus is only ever ENCODED (one distributed
    pass)."""
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string").cast("binary")))
        .limit(sample)
        .collect()
    )
    M = np.array([r[vec_col] for r in rows], dtype=np.float64)
    if M.ndim != 2 or M.shape[1] % m != 0:
        raise ValueError(f"vector dim {M.shape[-1]} not divisible by m={m}")
    M /= np.maximum(np.linalg.norm(M, axis=1), 1e-300)[:, None]
    dsub = M.shape[1] // m
    centers: list[list[list[float]]] = []
    for s in range(m):
        X = M[:, s * dsub : (s + 1) * dsub]
        # deterministic init: first k DISTINCT subvectors in md5 order —
        # duplicate rows (common in a dedup-oriented corpus) would seed
        # identical centers, and argmin's lower-index tie rule then
        # starves the duplicates forever (dead centers, shrunken
        # effective codebook)
        seen: set[bytes] = set()
        init = []
        for row in X:
            key = row.tobytes()
            if key not in seen:
                seen.add(key)
                init.append(row)
                if len(init) == k:
                    break
        if len(init) < k:
            raise ValueError(
                f"sample has only {len(init)} distinct subvectors in "
                f"subspace {s}; k={k} needs at least k distinct"
            )
        C = np.array(init)
        for _ in range(iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)  # ties -> lowest index (np.argmin)
            for c in range(k):
                hit = X[a == c]
                if len(hit):
                    C[c] = hit.mean(axis=0)
        centers.append([[float(x) for x in row] for row in C])
    return PqCodebooks(m=m, dsub=dsub, k=k, centers=centers)



def _round_half_away(x: float, nd: int) -> float:
    """round() with HALF-AWAY-FROM-ZERO ties in the SCALED-BINARY domain
    — exactly DuckDB's round() rule (multiply by 10^nd on the double,
    add 0.5, floor), which is the engine every driver-side value built
    here is hash-compared against. Python round()/np.round use banker's
    (half-to-even) and would diverge on ties. NOTE (review r14): Spark
    SQL's round() is subtly different again — it rounds the SHORTEST
    DECIMAL representation via BigDecimal HALF_UP, so on representation
    edges (round(0.285, 2): binary 28.499999… → DuckDB/here 0.28, Spark
    0.29) Spark can disagree with both; driver-side values that must
    hash against a SPARK-side round() cannot use this helper on such
    inputs. All current callers compare against DuckDB."""
    scale = 10.0 ** nd
    import math

    return math.copysign(math.floor(abs(x) * scale + 0.5) / scale, x)


def seeded_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    sample: int = 512,
    dims: int | None = None,
) -> PqCodebooks:
    """Zero-iteration PQ codebooks: subspace ``s``'s centers are the first
    ``k`` DISTINCT **raw** subvectors among the first ``sample`` vectors
    in md5(id) order — the :func:`seeded_centers` discipline applied per
    subspace, with zero Lloyd iterations and NO normalization.

    This is the oracle-checkable degenerate of :func:`train_pq` (which
    stays the library default): because every center is a verbatim slice
    of parquet floats picked by an engine-neutral md5 ordering, ANY
    engine re-derives bit-identical codebooks from the data alone, so an
    ADC search over the encoding is hash-verifiable end-to-end (encode
    with ``normalize=False, d2_round=...`` and search with
    ``normalize_query=False`` to keep every intermediate mirrorable).
    Quantization quality is strictly worse than trained k-means — this
    trades codebook optimality for cross-engine reproducibility, exactly
    like build_seeded_ivf_index vs build_ivf_index.

    ``dims`` filters the sample to exactly-that-length vectors BEFORE the
    md5 ordering — the same ``len(embedding) = dims`` predicate the SQL
    oracle applies to its base CTE, and the only way a ragged corpus
    yields the same sample on both engines (filtering after the cut
    would shift which vectors make the first ``sample``). Without it a
    ragged vector in the sample raises instead of being excluded."""
    sampled = corpus.select(F.col(id_col), F.col(vec_col)).filter(
        F.col(vec_col).isNotNull()
    )
    if dims is not None:
        if dims % m != 0:
            raise ValueError(f"dims={dims} not divisible by m={m}")
        sampled = sampled.filter(F.size(F.col(vec_col)) == dims)
    rows = (
        sampled.orderBy(F.md5(F.col(id_col).cast("string").cast("binary")))
        .limit(sample)
        .collect()
    )
    try:
        M = np.array([r[vec_col] for r in rows], dtype=np.float64)
    except ValueError as e:
        raise ValueError(
            "sample contains vectors of differing lengths — pass dims= to "
            "filter the corpus to one dimensionality (the oracle's "
            "len(embedding)=dims predicate)"
        ) from e
    if M.ndim != 2:
        raise ValueError(
            "sample contains vectors of differing lengths — pass dims= to "
            "filter the corpus to one dimensionality"
        )
    if M.shape[1] % m != 0:
        raise ValueError(f"vector dim {M.shape[-1]} not divisible by m={m}")
    dsub = M.shape[1] // m
    # canonicalize before keying distinctness: SQL GROUP BY uses VALUE
    # equality, so -0.0 must key like 0.0 (x + 0.0 normalizes the sign
    # of zero without changing any other value) and every NaN payload
    # must key like every other NaN — raw float64 bytes distinguish both
    M = M + 0.0
    M[np.isnan(M)] = np.nan
    centers: list[list[list[float]]] = []
    for s in range(m):
        X = M[:, s * dsub : (s + 1) * dsub]
        seen: set[bytes] = set()
        init: list[np.ndarray] = []
        for row in X:
            key = row.tobytes()
            if key not in seen:
                seen.add(key)
                init.append(row)
                if len(init) == k:
                    break
        if len(init) < k:
            raise ValueError(
                f"sample has only {len(init)} distinct subvectors in "
                f"subspace {s}; k={k} needs at least k distinct"
            )
        centers.append([[float(x) for x in row] for row in init])
    return PqCodebooks(m=m, dsub=dsub, k=k, centers=centers)


def pq_encode(
    corpus: DataFrame,
    books: PqCodebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[str] | None = None,
    normalize: bool = True,
    d2_round: int | None = None,
) -> DataFrame:
    """One distributed pass: (id, codes array<int>) — m codes per vector,
    nearest center per subspace over the UNIT-NORMALIZED vector. numpy
    per Arrow batch against broadcast center literals (the assign_cells
    pattern); nothing shuffles. ``extra_cols`` (e.g. an IVF cell column)
    ride along for composed indexes.

    ``normalize=False`` quantizes RAW subvectors (pair with seeded
    codebooks for the oracle-checkable path); ``d2_round`` rounds the
    squared distances before argmin so summation-order ULP noise can't
    flip a near-tie across engines (ties break toward the lower code in
    both)."""
    Cs = [np.array(c, dtype=np.float64) for c in books.centers]
    m, dsub = books.m, books.dsub

    @F.pandas_udf("array<int>")
    def _codes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        M = np.array(vecs.tolist(), dtype=np.float64)
        if M.shape[1] != m * dsub:
            raise ValueError(f"dim {M.shape[1]} != trained {m * dsub}")
        if normalize:
            M /= np.maximum(np.linalg.norm(M, axis=1), 1e-300)[:, None]
        out = np.empty((len(M), m), dtype=np.int32)
        for s in range(m):
            X = M[:, s * dsub : (s + 1) * dsub]
            d2 = ((X[:, None, :] - Cs[s][None, :, :]) ** 2).sum(axis=2)
            if d2_round is not None:
                # half-away ties (d2 >= 0, so floor(x*s + 0.5) is exact):
                # np.round is half-to-even, which diverges from the
                # oracle's round() on exact .5 boundaries
                d2 = np.floor(d2 * 10.0**d2_round + 0.5) / 10.0**d2_round
            out[:, s] = np.argmin(d2, axis=1)
        return pd.Series([r.tolist() for r in out])

    cols = [F.col(id_col), _codes(F.col(vec_col)).alias("codes")]
    for c in extra_cols or []:
        cols.append(F.col(c))
    return corpus.select(*cols)


def pq_topk(
    codes: DataFrame,
    books: PqCodebooks,
    query_vec: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
    rerank: DataFrame | None = None,
    vec_col: str = "embedding",
    shortlist: int | None = None,
    normalize_query: bool = True,
) -> DataFrame:
    """ADC search over an encoded corpus, PURE JVM in the hot path: the
    per-query lookup table (m×k inner products, driver-side numpy) inlines
    as array literals and each row's approximate cosine is m element_at
    lookups + adds inside whole-stage codegen — no Python, no float
    vectors touched, distributed TakeOrdered for the top-k. Compose with
    IVF by filtering ``codes`` to the probed cells first (codes built
    with extra_cols=["cell"]).

    ADC scores are LOSSY (8-64× compression): vectors sharing codes tie,
    so raw ADC rank order within a tight cluster is arbitrary. The
    standard usage (and the high-recall path) is shortlist-then-rerank:
    pass ``rerank`` = the raw-vector corpus, and the ADC top
    ``shortlist`` (default 4×topk) candidates — and ONLY those — are
    re-scored with exact cosine. The rerank join touches shortlist rows,
    never the corpus: the shortlist broadcasts, the corpus scan
    semi-joins against it."""
    q = np.array(query_vec, dtype=np.float64)
    if q.shape[0] != books.dim:
        raise ValueError(f"query dim {q.shape[0]} != trained {books.dim}")
    if normalize_query:
        q /= max(float(np.linalg.norm(q)), 1e-300)
    # normalize_query=False pairs with raw-subvector (seeded) codebooks:
    # the ADC sum then approximates dot(q, x) — a max-inner-product
    # shortlist, reranked to exact cosine below, and every intermediate
    # is mirrorable by the SQL oracle.
    m, dsub = books.m, books.dsub
    luts = [
        (np.array(books.centers[s], dtype=np.float64) @ q[s * dsub : (s + 1) * dsub])
        for s in range(m)
    ]
    score = F.lit(0.0)
    for s in range(m):
        lut = F.array(*[F.lit(_round_half_away(float(v), 9)) for v in luts[s]])
        score = score + F.element_at(lut, F.element_at("codes", s + 1) + F.lit(1))
    scored = codes.select(
        F.col(id_col).alias("neighbor_id"), F.round(score, 6).alias("adc_cos")
    )
    if rerank is None:
        return (
            scored.orderBy(F.desc("adc_cos"), F.asc("neighbor_id"))
            .limit(topk)
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.orderBy(F.desc("adc_cos"), F.asc("neighbor_id"))
                ),
            )
            .select("neighbor_id", "rank", "adc_cos")
        )
    sl = shortlist or 4 * topk
    short = scored.orderBy(F.desc("adc_cos"), F.asc("neighbor_id")).limit(sl)
    qlit = F.array(*[F.lit(float(x)) for x in np.asarray(query_vec, dtype=np.float64)])
    exact = (
        rerank.join(
            F.broadcast(short),
            rerank[id_col] == short["neighbor_id"],
        )
        .select(
            "neighbor_id",
            F.round(cosine(F.col(vec_col), qlit), 6).alias("cos"),
        )
    )
    return (
        exact.orderBy(F.desc("cos"), F.asc("neighbor_id"))
        .limit(topk)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("neighbor_id"))),
        )
        .select("neighbor_id", "rank", "cos")
    )


def pq_topk_multi(
    codes: DataFrame,
    books: PqCodebooks,
    queries: list[tuple[int, list[float]]],
    topk: int = 10,
    id_col: str = "vec_id",
    rerank: DataFrame | None = None,
    vec_col: str = "embedding",
    shortlist: int | None = None,
    normalize_query: bool = True,
) -> DataFrame:
    """Multi-query ADC search in ONE pass over the code table — the
    query-set twin of :func:`pq_topk` (API parity with
    brute_force_topk / lsh_topk / ivf_search, which all take query sets).

    Each query's m×k lookup table is computed driver-side and inlined as
    a literal array of (query_id, luts) structs; one explode amplifies
    the code scan ×Q (Q = len(queries), bounded and small by contract —
    a query BATCH, not a corpus) and each (row, query) pair scores as m
    element_at adds, all JVM. Per-query top-k comes from a single window
    partitioned by query_id — still one job, no per-query scan of the
    codes. With ``rerank`` the per-query ADC shortlists (Q·shortlist
    rows total) broadcast against the raw corpus for exact-cosine
    rescoring, same discipline as pq_topk.

    Returns (query_id, rank, neighbor_id, cos|adc_cos)."""
    if not queries:
        raise ValueError("queries must be non-empty")
    m, dsub = books.m, books.dsub
    qlits = []
    for qid, qv in queries:
        q = np.array(qv, dtype=np.float64)
        if q.shape[0] != books.dim:
            raise ValueError(f"query {qid} dim {q.shape[0]} != trained {books.dim}")
        if normalize_query:
            q /= max(float(np.linalg.norm(q)), 1e-300)
        # one nested-list literal per query, NOT one F.lit per LUT cell:
        # m×k per-element lits cost a py4j round trip each (~1 s per
        # 1.3k literals, the ivf_search_rows measurement) — 50 queries at
        # m=4,k=256 was ~51k round trips of pure driver stall before the
        # job started (review r14). The VALUES stay per-element np.dot +
        # _round_half_away, bit-identical to the old loop (a vectorized
        # BLAS matmul could re-order the summation).
        lut_vals = [
            [
                _round_half_away(
                    float(
                        np.dot(
                            np.array(books.centers[s][c]),
                            q[s * dsub : (s + 1) * dsub],
                        )
                    ),
                    9,
                )
                for c in range(books.k)
            ]
            for s in range(m)
        ]
        qlits.append(
            F.struct(
                F.lit(qid).alias("query_id"), F.lit(lut_vals).alias("luts")
            )
        )
    exploded = codes.select(
        F.col(id_col).alias("neighbor_id"),
        "codes",
        F.explode(F.array(*qlits)).alias("_q"),
    )
    score = F.lit(0.0)
    for s in range(m):
        score = score + F.element_at(
            F.element_at("_q.luts", s + 1), F.element_at("codes", s + 1) + F.lit(1)
        )
    scored = exploded.select(
        F.col("_q.query_id").alias("query_id"),
        "neighbor_id",
        F.round(score, 6).alias("adc_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_cos"), F.asc("neighbor_id"))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .select("query_id", "rank", "neighbor_id", "adc_cos")
        )
    sl = shortlist or 4 * topk
    short = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= sl)
        .select("query_id", "neighbor_id")
    )
    qvecs = F.array(
        *[
            F.struct(
                F.lit(qid).alias("query_id"),
                F.array(*[F.lit(float(x)) for x in qv]).alias("qvec"),
            )
            for qid, qv in queries
        ]
    )
    qdf = (
        codes.sparkSession.range(1)
        .select(F.explode(qvecs).alias("_q"))
        .select("_q.query_id", "_q.qvec")
    )
    exact = (
        rerank.join(
            F.broadcast(short), rerank[id_col] == short["neighbor_id"]
        )
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col(vec_col), F.col("qvec")), 6).alias("cos"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def write_pq_index(
    codes: DataFrame,
    books: PqCodebooks,
    path: str,
) -> None:
    """Materialize an encoded PQ index: the code table (partitioned by
    ``cell`` when the IVF composition column is present — a probed
    search then reads only its cells' directories) plus the codebooks as
    a tiny parquet table. At 100 TB the codes are the index's entire
    storage footprint: m small ints per vector, 16-64× under the raw
    floats — the reason PQ exists."""
    spark = codes.sparkSession
    if "cell" in codes.columns:
        # one file per cell dir instead of one per (task × cell) — see
        # write_ivf_index
        writer = codes.repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        )
    else:
        writer = codes.write.mode("overwrite")
    writer.parquet(f"{path}/codes")
    rows = [
        (s, c, books.centers[s][c])
        for s in range(books.m)
        for c in range(books.k)
    ]
    spark.createDataFrame(
        rows, "sub INT, code INT, center ARRAY<DOUBLE>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def load_pq_index(spark, path: str) -> tuple[DataFrame, PqCodebooks]:
    """Reopen a written PQ index: lazy code scan + reconstructed
    codebooks (exact floats — parquet doubles round-trip)."""
    rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = max(r["sub"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    by = {(r["sub"], r["code"]): [float(x) for x in r["center"]] for r in rows}
    centers = [[by[(s, c)] for c in range(k)] for s in range(m)]
    books = PqCodebooks(m=m, dsub=len(centers[0][0]), k=k, centers=centers)
    return spark.read.parquet(f"{path}/codes"), books
