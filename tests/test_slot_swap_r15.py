"""Battery ≡ standalone pins for the r15 slot swap (VERDICT r14 #1).

The ANN trio and the multimodal pair consolidated into per-variant
digest batteries to free registry slots. The consolidation must not
weaken what is verified: each battery row's (n_rows, checksum, ...)
must equal the digest computed INDEPENDENTLY (pure Python, no Spark
aggregation) from the standalone function's full output — so the
battery verifies exactly the rows the three retired gates verified.
"""

from __future__ import annotations

import hashlib
import math

from tests.conftest import SF_DIR


def _half_up(x: float) -> int:
    # Spark F.round is HALF_UP (away from zero); Python round() is
    # half-even — mirror Spark explicitly
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _checksum(parts: list[str]) -> int:
    h = hashlib.md5("|".join(parts).encode()).hexdigest()
    return int(h[:15], 16) % 100_000_000_000


def test_ann_battery_equals_standalone_results(spark):
    from quackpipe_spark.workloads.llm_ops import (
        ann_battery,
        ann_topk_bruteforce,
        ann_topk_ivf,
        ann_topk_lsh,
    )

    battery = {r["variant"]: r for r in ann_battery(spark, SF_DIR).collect()}
    for name, fn in (
        ("bruteforce", ann_topk_bruteforce),
        ("ivf", ann_topk_ivf),
        ("lsh", ann_topk_lsh),
    ):
        rows = fn(spark, SF_DIR).collect()
        assert rows, name
        cos_e6 = [_half_up(r["cos"] * 1e6) for r in rows]
        want = {
            "n_rows": len(rows),
            "n_queries": len({r["query_id"] for r in rows}),
            "sum_cos_e6": sum(cos_e6),
            "checksum": sum(
                _checksum(
                    [
                        str(r["query_id"]),
                        str(r["rank"]),
                        str(r["neighbor_id"]),
                        str(c),
                    ]
                )
                for r, c in zip(rows, cos_e6)
            ),
        }
        got = battery[name]
        for k, v in want.items():
            assert got[k] == v, (name, k, got[k], v)


def test_multimodal_battery_equals_standalone_results(spark):
    from quackpipe_spark.workloads.llm_ops import (
        multimodal_battery,
        multimodal_decode,
        multimodal_summary,
    )

    battery = {
        r["variant"]: r for r in multimodal_battery(spark, SF_DIR).collect()
    }

    srows = multimodal_summary(spark, SF_DIR).collect()
    assert srows
    got = battery["summary"]
    assert got["n_rows"] == len(srows)
    assert got["sum_n"] == sum(r["n"] for r in srows)
    assert got["checksum"] == sum(
        _checksum(
            [
                r["kind"],
                str(r["n"]),
                str(r["total_bytes"]),
                str(_half_up(r["avg_bytes"] * 100)),
            ]
        )
        for r in srows
    )

    drows = multimodal_decode(spark, SF_DIR).collect()
    assert drows
    got = battery["decode"]
    assert got["n_rows"] == len(drows)
    assert got["sum_n"] == sum(r["n_frames"] for r in drows)
    assert got["checksum"] == sum(
        _checksum(
            [
                str(r["media_id"]),
                r["kind"],
                str(r["width"]),
                str(r["height"]),
                str(r["n_frames"]),
                str(r["feature_dim"]),
            ]
        )
        for r in drows
    )


def test_semantic_dedup_gate_matches_library_closure(spark):
    """The gate's components must equal the library operator's over the
    same pair set — the gate is a thin wiring of semantic_dedup, and this
    pins that the wiring (threshold, cells, probes) didn't fork."""
    from pyspark.sql import functions as F

    from quackpipe_spark.operators import similarity as S
    from quackpipe_spark.workloads.llm_ops import (
        _EMB_CELLS,
        _EMB_PROBES,
        _emb64,
        semantic_dedup_gate,
    )

    got = {
        (r["vec_id"], r["component"], r["is_canonical"])
        for r in semantic_dedup_gate(spark, SF_DIR).collect()
    }
    emb = _emb64(spark, SF_DIR)
    n_cells = max(_EMB_CELLS, -(-emb.count() // 512))
    pairs = S.blocked_near_pairs(
        emb, threshold=0.40, n_cells=n_cells, probes=_EMB_PROBES
    ).select("a", "b").collect()
    # independent union-find over the collected pairs
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p["a"]), find(p["b"])
        if ra != rb:
            hi, lo = max(ra, rb), min(ra, rb)
            parent[hi] = lo
    want = set()
    for r in emb.select("vec_id").collect():
        v = r["vec_id"]
        comp = find(v) if v in parent else v
        want.add((v, comp, v == comp))
    assert got == want
