"""Skew-handling join: salting for hot keys.

AQE's skew-join splitting (on in session.py) handles most sort-merge skew
at runtime; salting is the explicit tool for the cases AQE can't touch —
aggregations over hot keys and joins where one side must replicate.

``salted_join``: the big (skewed) side gets a random-ish salt in
[0, salt) derived deterministically from row content; the small side is
exploded ``salt`` times so every (key, salt) bucket finds its match. The
hot key's rows spread over ``salt`` reducers instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on ``key`` with an added salt dimension.

    Equivalent to ``big.join(small, key, how)`` for inner/left joins; the
    salt column never leaks into the output. The big side's salt derives
    from the row's POSITION (monotonically_increasing_id), not its
    content: a content hash gives identical rows identical salts, so a
    hot key whose rows are duplicates (heartbeats, low-cardinality
    payloads) would still pile onto one reducer — exactly the straggler
    this operator exists to remove. Position is stable within a task
    attempt (no rand(): a task retry re-derives the same salts, so rows
    are neither doubled nor dropped), and join RESULTS are salt-invariant
    anyway — the salt only spreads the work.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    if salt < 1:
        # salt=0 would corrupt silently: sequence(0, -1) infers a negative
        # step ([0, -1]) while pmod(x, 0) is NULL ANSI-off — the equi-join
        # never matches and an inner join returns 0 rows without error
        raise ValueError("salt must be >= 1")
    if "_salt" in big.columns or "_salt" in small.columns:
        # withColumn would clobber it and the final drop would delete the
        # user's column from the output — reject like asof_join does for
        # its reserved names
        raise ValueError("inputs must not carry a '_salt' column (reserved)")
    big_s = big.withColumn(
        "_salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
