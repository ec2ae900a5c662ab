"""Scale machinery: skew-salted joins and bucketed co-located joins.

These are the two levers AQE can't always pull for you at 100 TB:

* **Salting** — when one join key carries a disproportionate share of
  rows (a celebrity user, a null-ish default key), hash partitioning
  sends it all to one task. Salting splits the hot key into N
  sub-keys: the skewed side gets a random salt 0..N-1, the small side
  is replicated N times, and the join key becomes (key, salt). AQE's
  skew-join splits oversized partitions post-shuffle, but salting is
  the explicit, planner-independent fix — and the only one for
  skewed *aggregations*.

* **Bucketing** — pre-shuffling a table once at write time
  (bucketBy on the join key) so every subsequent join/agg on that key
  is exchange-free. At 100 TB you bucket the fact tables at ingest;
  the per-query saving is the entire fact-table shuffle.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str | None = None,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact side to a smaller side with key salting.

    The skewed side gets ``salt = pmod(hash(monotonic row id), N)``;
    the small side is exploded N-fold with every salt value. The
    result equals a plain join on ``key`` but the hot key's rows
    spread over N tasks. The small side's replication cost is N x
    its size — keep it for genuinely small/medium dimension sides.
    """
    small_key = small_key or key
    salted_fact = skewed.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    # rename the small side's join helpers to avoid ambiguity when the
    # two sides share column names
    salted_dim = small.withColumnRenamed(small_key, "_sj_key").withColumn(
        "_sj_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    cond = (salted_fact[key] == salted_dim["_sj_key"]) & (
        salted_fact["_salt"] == salted_dim["_sj_salt"]
    )
    return salted_fact.join(salted_dim, cond, how).drop("_salt", "_sj_salt", "_sj_key")


def salted_count(df: DataFrame, key: str, salt_buckets: int = 64) -> DataFrame:
    """Two-phase skew-safe count per key: count per (key, salt) first
    (spreads a hot key over N tasks), then combine. Same trick
    generalizes to any algebraic aggregate (sum/min/max/avg via
    sum+count)."""
    return (
        df.withColumn(
            "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
        )
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("cnt"))
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on the join
    key. Subsequent equi-joins/aggregations between tables bucketed
    the same way on the same key run with NO exchange (and no sort,
    if sorted)."""
    spark = df.sparkSession
    # an orphaned warehouse dir (table dropped from a fresh catalog but
    # files left behind) blocks saveAsTable — clear both
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed saved tables — plan shows zero Exchange
    under the join when bucketing lines up (verified in tests)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
