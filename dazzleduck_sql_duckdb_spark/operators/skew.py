"""Skew handling: salted joins for pathological hot keys.

AQE's skew-join splitting (on in session.py) handles most skew by
splitting oversized shuffle partitions. This operator is the manual
fallback for the extreme case AQE can't fix — a single join key so hot
that even one map-split of it overwhelms a task (the classic NULL-key /
celebrity-user problem at 100 TB):

- the big (skewed) side gets a deterministic salt in [0, salt),
- the small side is replicated `salt` times (explode, NOT broadcast —
  this path exists precisely when the small side is too big to
  broadcast but small enough to replicate),
- the join key becomes (key, salt): the hot key's rows now spread
  across `salt` shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contains_map(dt: T.DataType) -> bool:
    """xxhash64 rejects MapType at ANY nesting depth (map hashing is
    order-undefined), so a struct/array wrapping a map must be excluded
    from the salt hash just like a top-level map column."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big` (skewed) with `small` on column `on`, spreading
    each key over `salt` shuffle partitions. Result equals
    ``big.join(small, on, how)`` for inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    # deterministic salt per row: xxhash64 over the ROW'S OWN columns —
    # a pure function of the data, so it is retry-stable (a re-executed
    # task salts identically; monotonically_increasing_id/rand are not,
    # being partition-position dependent). Identical duplicate rows
    # share a bucket — acceptable, since hot keys are hot via many
    # DISTINCT payload rows; and even under re-salting the join result
    # is correct regardless, because the small side carries every salt
    # value (fully replicated).
    hashable = [
        f.name for f in big.schema.fields
        if not _contains_map(f.dataType)  # xxhash64 rejects maps
    ] or [on]
    big_s = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(salt))
        .cast("int"),
    )
    small_s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
    )
    out = big_s.join(small_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")
