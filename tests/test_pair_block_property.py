"""Property tests for the r12 `_pair_block` kernel rewrite.

The tiled accumulation and the vectorized canonical-cell filter replaced
a straight-line implementation whose BIT-EXACT outputs the oracle
depends on (cosines must equal DuckDB's sequential list-fold after
rounding). These properties pin the rewrite against an independent
reference over random cells: arbitrary row counts (including the tile
remainder p % 64 ≠ 0), degenerate vectors, duplicate probe-cell sets,
and probe counts ≠ 2.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from quackpipe_spark.operators.similarity import _pair_block


def _reference_pair_block(ids, M, pcs, cell, slack):
    """The pre-r12 straight-line kernel: dims rank-1 sweeps over the full
    p×p matrix and a per-pair Python set-intersection loop."""
    p = len(ids)
    S = np.zeros((p, p))
    for i in range(M.shape[1]):
        col = M[:, i]
        S += col[:, None] * col[None, :]
    nr = np.sqrt(np.diag(S))
    C = S / (nr[:, None] * nr[None, :])
    ai, bi = np.triu_indices(p, 1)
    keep = C[ai, bi] >= slack
    ai, bi, cos = ai[keep], bi[keep], C[ai, bi][keep]
    emit = np.fromiter(
        (
            bool(pcs[x] & pcs[y]) and min(pcs[x] & pcs[y]) == cell
            for x, y in zip(ai, bi)
        ),
        dtype=bool,
        count=len(ai),
    )
    return ids[ai[emit]], ids[bi[emit]], cos[emit]


@settings(max_examples=60, deadline=None)
@given(
    p=st.integers(min_value=2, max_value=150),  # crosses the 64-row tile edge
    dims=st.integers(min_value=1, max_value=8),
    probes=st.integers(min_value=1, max_value=3),
    n_cells=st.integers(min_value=1, max_value=6),
    cell=st.integers(min_value=0, max_value=5),
    slack=st.floats(min_value=-1.0, max_value=1.0),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_pair_block_matches_reference(p, dims, probes, n_cells, cell, slack, seed):
    rng = np.random.default_rng(seed)
    ids = np.sort(rng.choice(10 * p, size=p, replace=False)).astype(np.int64)
    M = rng.normal(size=(p, dims))
    # a few exact-duplicate and near-zero vectors to stress degenerate
    # norms and cosine == 1.0 boundaries
    if p >= 4:
        M[1] = M[0]
        M[2] = M[0] * 1e-9
    pcs = [
        set(rng.choice(n_cells, size=min(probes, n_cells), replace=False).tolist())
        for _ in range(p)
    ]
    got = _pair_block(ids, M.copy(), [set(s) for s in pcs], cell, slack)
    want = _reference_pair_block(ids, M.copy(), [set(s) for s in pcs], cell, slack)
    assert np.array_equal(got[0], want[0])
    assert np.array_equal(got[1], want[1])
    # bit-exact, not approximately equal — the oracle contract
    assert np.array_equal(got[2], want[2])
