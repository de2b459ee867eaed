"""Config-reconcile operators (SURVEY.md §2.3 J4/J5).

The reference reconciles a client's desired exclusion-folder list against
the stored one with a Venn partition — ``GetVennSet(mine, theirs, key)``
returning {OnlyInMyItems, InBoth, OnlyInOtherItems}
(``Extensions/CommonExtensions.cs:9-48``, used at
``Services/OpcuaHelperService.cs:143-164`` to drive delete/update/insert),
and eager-loads each connection's folders with an EF ``Include``
(``Services/OpcuaHelperService.cs:68-70``).

Spark-first: the Venn partition is ONE full-outer join with presence flags
— not three separate joins — so the fact side is shuffled once. At 100 TB
this matters: a reconcile of two large key sets is a single co-partitioned
exchange on the key, and the three-way split is a free projection on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VENN_LEFT_ONLY = "left_only"
VENN_BOTH = "both"
VENN_RIGHT_ONLY = "right_only"


def venn_partition(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    """J5 — partition the key space of two inputs into
    left_only / both / right_only (CommonExtensions.cs:9-48).

    Returns one row per distinct key with a ``venn_side`` label. Single
    full-outer join on the key columns; both sides are key-deduped first
    (the reference compares by key, not by row multiplicity).
    """
    lk = left.select(*keys).distinct().withColumn("_l", F.lit(1))
    rk = right.select(*keys).distinct().withColumn("_r", F.lit(1))
    joined = lk.join(rk, keys, "full_outer")
    side = (
        F.when(F.col("_l").isNotNull() & F.col("_r").isNotNull(), F.lit(VENN_BOTH))
        .when(F.col("_l").isNotNull(), F.lit(VENN_LEFT_ONLY))
        .otherwise(F.lit(VENN_RIGHT_ONLY))
    )
    return joined.select(*keys, side.alias("venn_side"))


def connection_exclusions(connections: DataFrame, folders: DataFrame) -> DataFrame:
    """J4 — eager-load each connection's exclusion folders
    (Services/OpcuaHelperService.cs:68-70, EF ``Include``).

    The one-to-many child list is collapsed to a deterministic
    comma-joined, sorted string (array ordering is engine-dependent;
    a sorted join key is oracle-stable). Connections with no folders keep
    an empty string — the reference returns an empty child list.
    """
    agg = folders.groupBy("conn_id").agg(
        F.array_join(F.sort_array(F.collect_list("folder")), ",").alias("folders"),
        F.count("*").alias("n_folders"),
    )
    return (
        connections.join(F.broadcast(agg), "conn_id", "left")
        .select(
            "conn_id",
            "connection_name",
            F.coalesce("folders", F.lit("")).alias("folders"),
            F.coalesce("n_folders", F.lit(0)).alias("n_folders"),
        )
    )
