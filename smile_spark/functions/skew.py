"""Skew-handling join utilities.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in
our session factory) handles most runtime skew by splitting oversized
shuffle partitions.  Salting is the complementary *plan-level* tool
for the case AQE can't fix: a handful of hot keys so large that even a
split partition is dominated by one key on both sides of a
shuffled-hash / sort-merge join.

``salted_join`` spreads each hot key of the big side over ``n_salts``
synthetic sub-keys and replicates the small(er) side once per salt, so
the hot key's rows land on ``n_salts`` different reducers instead of
one.  Join semantics are unchanged — the salt only changes row
placement (salt values are randomized but the (key, salt) join matches
exactly the original key matches).

The reference has no analogue (single-node OpenMP with a shared hash
table never shuffles); this exists because a 100 TB join with a
power-law key IS the common case in web-scale corpora.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__smile_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str] | str,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` with the big side salted ``n_salts``
    ways.

    ``big`` gets a random salt per row; ``small`` is replicated once
    per salt value (×``n_salts`` rows — use only when small is much
    smaller than big but too large or too skew-matched to broadcast).
    Result is identical to ``big.join(small, on, how)``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salted_big = big.withColumn(
        _SALT, (F.rand(seed) * n_salts).cast("int")
    )
    salts = (
        small.sparkSession.range(n_salts)
        .select(F.col("id").cast("int").alias(_SALT))
    )
    replicated_small = small.crossJoin(F.broadcast(salts))
    return salted_big.join(
        replicated_small, keys + [_SALT], how
    ).drop(_SALT)
