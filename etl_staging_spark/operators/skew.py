"""Hot-key salting for skewed joins.

AQE's skew-join splitting (enabled in `session.py`) handles skewed
SORT-MERGE partitions at runtime, but it cannot help when a single join
key is so hot that one (key, partition) pair dominates — e.g. the
NULL-ish default partner, a mega-customer, the "unknown" account. The
classic fix is salting: spread the hot key's fact rows over N synthetic
sub-keys and replicate the (small) dim rows N times so every sub-key
still finds its match.

Scale shape: the dim side grows by |hot_keys| × n_salts rows (tiny);
the fact side gets one extra projected column; the join output is
IDENTICAL to the unsalted join. Hot-key discovery is one map-side-
combinable count aggregate with a bounded (threshold-filtered) collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def find_hot_keys(df: DataFrame, key: str, threshold: int) -> list:
    """Keys whose row count exceeds ``threshold`` — ONE aggregate, and
    the collect is bounded by construction (only keys above the
    threshold come back; pick a threshold >> rows/partition so the list
    stays small)."""
    rows = (
        df.groupBy(key)
        .count()
        .where(F.col("count") > threshold)
        .select(key)
        .collect()
    )
    return [r[0] for r in rows]


def _fact_salt(key_col: Column, hot_keys: list, n_salts: int) -> Column:
    """Deterministic-enough uniform salt for fact rows on hot keys; 0
    for everyone else (so cold keys pay nothing). Any assignment works
    for join correctness — each fact row just needs SOME salt that the
    replicated dim covers."""
    return F.when(
        key_col.isin(hot_keys),
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    ).otherwise(F.lit(0))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    hot_keys: list,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``on`` with the listed hot keys
    spread over ``n_salts`` sub-keys. Result equals
    ``fact.join(dim, on, how)`` row-for-row; only the shuffle layout
    changes. ``how`` supports inner/left (the fact-preserving shapes a
    skewed fact side needs)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if not hot_keys:
        return fact.join(dim, on, how)
    salts = F.when(
        F.col(on).isin(hot_keys),
        F.sequence(F.lit(0), F.lit(n_salts - 1)),
    ).otherwise(F.array(F.lit(0)))
    dim_rep = dim.withColumn(SALT, F.explode(salts))
    fact_s = fact.withColumn(SALT, _fact_salt(F.col(on), hot_keys, n_salts))
    return fact_s.join(dim_rep, [on, SALT], how).drop(SALT)
