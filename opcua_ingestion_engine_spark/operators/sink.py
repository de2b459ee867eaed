"""MERGE-shaped batch sinks (SURVEY.md §2.1 S9/S10/S11, §2.3 J6).

The reference's only write path is three row-level SQL patterns against the
``modvalues`` current-state table:

- S9 ``ModifyMeasure``: keyed UPDATE of (tag_value, measure_value,
  last_updated) WHERE device AND measure_name match
  (``Services/OpcSubscribeService.cs:600-654``; the key equi-join J6 at
  ``:608-612,624-630``). Unmatched incoming rows are NOT inserted.
- S10 ``CheckAndAddMeasure``: INSERT a zero row if the key is absent
  (``:656-713``); existing rows are left untouched.
- S11 ``SetAllMyPVOnlineFalse``: one bulk conditional UPDATE of every
  ``myPV_online`` row to 0 at startup (``:715-739``).

Spark-first: each is a pure ``DataFrame -> DataFrame`` transform producing
the post-merge table, so they compose in batch and inside ``foreachBatch``
(where a Delta ``MERGE INTO`` would replace the final materialization —
T9). Scale notes per function.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timefmt import format_modvalues_ts


def upsert_matched(
    current: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    set_cols: list[str],
) -> DataFrame:
    """S9/J6 — MERGE ... WHEN MATCHED THEN UPDATE (no insert branch).

    ``incoming`` must be key-unique (pre-reduce with latest-per-key A2,
    as the serialized reference upserts do implicitly). Implemented as a
    left join of current onto incoming + matched-marker CASE per SET
    column — one shuffle co-partitioned on the key (or a broadcast when
    the incoming batch is small, which is the streaming micro-batch
    case: let AQE decide). MATCHED is the join marker, never value
    nullability: SQL's WHEN MATCHED UPDATE overwrites every SET column
    together, so a matched row with a NULL incoming value writes NULL
    (per-column coalesce would keep stale values and update the columns
    inconsistently).
    """
    inc = incoming.select(
        *keys,
        *[F.col(c).alias(f"_new_{c}") for c in set_cols],
        F.lit(True).alias("_m"),
    )
    out = current.join(inc, keys, "left")
    matched = F.col("_m").isNotNull()
    for c in set_cols:
        out = out.withColumn(
            c, F.when(matched, F.col(f"_new_{c}")).otherwise(F.col(c))
        )
    return out.drop("_m", *[f"_new_{c}" for c in set_cols])


def insert_if_missing(current: DataFrame, seeds: DataFrame, keys: list[str]) -> DataFrame:
    """S10 — MERGE ... WHEN NOT MATCHED THEN INSERT.

    ``seeds`` rows whose key already exists in ``current`` are dropped
    (left_anti); the rest are appended. Anti join shuffles on the key;
    when ``current`` is the small side (startup seeding of a fresh table)
    AQE turns it into a broadcast anti join.
    """
    missing = seeds.join(current.select(*keys), keys, "left_anti")
    return current.unionByName(missing)


def bulk_reset_online(current: DataFrame, reset_ts_text: str) -> DataFrame:
    """S11/T8 — the startup bulk UPDATE: every ``myPV_online`` row gets
    value 0.0 and a fresh timestamp, all other rows pass through.

    A single conditional projection — no shuffle at any scale (the
    reference comments this exact set-based-beats-row-loop point,
    OpcSubscribeService.cs:715-716).
    """
    is_online_row = F.col("tag_name") == "myPV_online"
    return (
        current.withColumn(
            "tag_value", F.when(is_online_row, F.lit(0.0)).otherwise(F.col("tag_value"))
        )
        .withColumn(
            "measure_value",
            F.when(is_online_row, F.lit(0.0)).otherwise(F.col("measure_value")),
        )
        .withColumn(
            "last_updated",
            F.when(is_online_row, F.lit(reset_ts_text)).otherwise(F.col("last_updated")),
        )
    )


def upsert_values(
    current: DataFrame,
    latest_updates: DataFrame,
) -> DataFrame:
    """The composed reference write path for one batch of updates against a
    modvalues-shaped table: S9 matched-update of the value columns.

    ``latest_updates`` columns: device, measure_name, scaled_value,
    received_ts (key-unique). Values land in tag_value AND measure_value
    (OpcSubscribeService.cs:636-637); last_updated gets the X5 text stamp.
    """
    inc = latest_updates.select(
        "device",
        "measure_name",
        F.col("scaled_value").alias("_v"),
        format_modvalues_ts("received_ts").alias("_ts"),
        F.lit(True).alias("_m"),
    )
    out = current.join(inc, ["device", "measure_name"], "left")
    # MATCHED is decided by the join marker, never by value nullability:
    # SQL's WHEN MATCHED UPDATE overwrites every SET column together, so
    # a matched row with a NULL incoming value writes NULL (coalesce
    # would silently keep the stale value while last_updated advanced —
    # a row claiming freshness it does not have).
    matched = F.col("_m").isNotNull()
    return (
        out.withColumn("tag_value", F.when(matched, F.col("_v")).otherwise(F.col("tag_value")))
        .withColumn("measure_value", F.when(matched, F.col("_v")).otherwise(F.col("measure_value")))
        .withColumn("last_updated", F.when(matched, F.col("_ts")).otherwise(F.col("last_updated")))
        .drop("_v", "_ts", "_m")
    )


def write_bucketed_state(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | None = None,
    num_buckets: int = 16,
) -> None:
    """Persist a state table bucketed on its merge key
    (``bucketBy(hash(device), ...)`` + ``sortBy`` within buckets).

    This is the 100 TB layout for the perpetually-merged ``modvalues``
    state: every MERGE round (S9/S10, foreachBatch T9) joins on the same
    (device, measure) key, and a bucketed table makes that join
    exchange-free on the stored side — the incoming micro-batch is
    shuffled into the fixed bucket scheme once, instead of both sides
    re-shuffling every round. tests/test_units.py pins the property: a
    self-join of the bucketed table on the bucket key plans with ZERO
    Exchange nodes.
    """
    keys = bucket_cols or ["device", "measure_name"]
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(table)
    )


# ---------------------------------------------------------------------------
# S7 — ensure-table DDL
# ---------------------------------------------------------------------------

MODVALUES_DDL = (
    "device string, device_type string, tag_name string, tag_value double, "
    "measure_name string, measure_value double, source_unit string, "
    "destination_unit string, last_updated string, logging string"
)


def ensure_table(spark, path: str, schema: str = MODVALUES_DDL) -> bool:
    """S7 — CREATE TABLE IF NOT EXISTS for a parquet-backed table
    (OpcSubscribeService.cs:116-159 probes information_schema.tables and
    issues the modvalues DDL when absent).

    Writes an empty frame with the declared schema iff the table does not
    already exist (``mode('ignore')`` is Spark's write-if-missing).
    Returns True when this call created the table. The existence probe is
    a filesystem check here (local parquet); against a real catalog the
    same contract is ``spark.catalog.tableExists`` + saveAsTable.
    """
    import os

    existed = os.path.isdir(path)
    spark.createDataFrame([], schema).write.mode("ignore").parquet(path)
    return not existed


# ---------------------------------------------------------------------------
# Event-history layout — date partitioning (SURVEY.md §4: "partition
# events by date"; the modvalues-state analogue is write_bucketed_state)
# ---------------------------------------------------------------------------


def write_events_partitioned(events: DataFrame, path: str) -> None:
    """Persist the event history hive-partitioned by event date, so
    time-bounded queries (heartbeat windows, staleness audits, T10
    window aggregations over a day) touch only the matching partition
    directories instead of the full 100 TB history.

    The partition column is derived (date(ts)) and kept ALONGSIDE the
    full-fidelity ts column; readers filter on event_date for pruning
    and on ts for exact bounds. Dynamic overwrite would make the write
    idempotent per day on re-runs of a backfill.
    """
    from pyspark.sql import functions as F

    events.withColumn("event_date", F.to_date("ts")).write.mode(
        "overwrite"
    ).partitionBy("event_date").parquet(path)


def compact_small_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Maintenance op: rewrite a parquet directory into ~target-sized
    files. Streaming micro-batch sinks accrete small files (one-per-
    trigger-per-partition); at 100 TB an uncompacted table turns every
    scan into a metadata storm (800k+ file opens). Returns the resulting
    file count.

    Sizing: output file count = ceil(total_bytes / target) measured from
    the current footprint — a cheap driver-side directory listing, no
    data read. The rewrite is one coalesce(n) pass (no shuffle: coalesce
    narrows partitions; repartition would be needed only to also
    redistribute skew).

    This is a SINGLE-WRITER maintenance op, not reader-safe: the swap is
    two directory moves, and between them (or if the process dies there)
    the table path briefly does not exist — a concurrent reader can fail,
    and a crash leaves the data recoverable only from ``.compact_old``.
    On a real deployment use an ACID table format (Delta/Iceberg
    ``OPTIMIZE``), whose snapshot swap is a single atomic metadata
    commit; plain-directory parquet has no atomic rename-over-nonempty.
    """
    import glob as _glob
    import os
    import shutil

    # Hive-partitioned layouts are REFUSED, not silently flattened: a
    # coalesce rewrite would mix all partition values into flat files —
    # destroying directory pruning and leaving partition=... readers
    # finding nothing. Compact such tables per partition directory.
    parts = [
        d for d in os.listdir(path)
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]
    if parts:
        raise ValueError(
            f"{path} is hive-partitioned ({parts[0]}, ...) — compact each "
            "partition directory individually; a whole-table rewrite "
            "would flatten the partitioning"
        )
    files = [
        f for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    ]
    if not files:
        return 0  # nothing to compact (schema inference would fail anyway)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))
    tmp = path.rstrip("/") + ".compact_tmp"
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + ".compact_old"
    shutil.move(path, bak)
    shutil.move(tmp, path)
    shutil.rmtree(bak)
    return len(_glob.glob(os.path.join(path, "*.parquet")))


def interleave_bits(qx, qy, bits: int):
    """Column expression: interleave two ``bits``-bit integer rank
    columns into one Morton (z-curve) value. Pure shift/mask arithmetic
    — codegen'd, no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        # Column.__or__ is logical OR in PySpark — bitwise needs bitwiseOR
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(qx, i).bitwiseAND(1), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(qy, i).bitwiseAND(1), 2 * i + 1)
        )
    return z


def quantile_rank(col, boundaries: list[float]):
    """Column expression: 0-based quantile bucket of ``col`` against
    precomputed boundary values — count of boundaries <= col, via a
    higher-order filter over the (config-sized) boundary array literal.
    Rank-based bucketing is what makes z-ordering effective on SKEWED
    columns: min-max scaling would pack the dense region into a handful
    of buckets and the curve would stop separating it."""
    from pyspark.sql import functions as F

    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    c = col.cast("double")
    return F.size(F.filter(arr, lambda b: b <= c)).cast("long")


def compute_zorder_sketch(
    df: DataFrame, col_x: str, col_y: str, bits: int = 8
) -> dict:
    """One approxQuantile pass over ``df`` producing the boundary sketch
    that drives quantile-rank z-ordering: ``2^bits - 1`` boundaries per
    column. The sketch is config-sized (2 * 255 doubles at bits=8) and
    is meant to be computed ONCE — on the initial load or a sample — and
    persisted beside the table (`save_zorder_sketch`), so every later
    append quantizes against the SAME curve without re-scanning history.
    At 100 TB that turns layout maintenance from a full-table statistics
    pass per batch into a JSON read."""
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    bx, by = df.approxQuantile([col_x, col_y], probs, 0.001)
    return {"col_x": col_x, "col_y": col_y, "bits": bits, "bx": bx, "by": by}


def _sketch_path(path: str) -> str:
    # Leading underscore: Spark/Hadoop readers ignore _-prefixed files in
    # a table directory (same convention as _SUCCESS), so the sidecar is
    # invisible to spark.read.parquet(path).
    return os.path.join(path, "_zorder_sketch.json")


def save_zorder_sketch(path: str, sketch: dict) -> None:
    import json

    with open(_sketch_path(path), "w") as f:
        json.dump(sketch, f)


def load_zorder_sketch(path: str) -> dict:
    import json

    with open(_sketch_path(path)) as f:
        return json.load(f)


def write_zordered(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 8,
    bits: int = 8,
    sketch: dict | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table z-ordered on two columns, so min/max row-group and
    file statistics prune scans filtered on EITHER column (or both).

    A single-column sort gives perfect pruning on that column and none
    on the other; hive-partitioning on both explodes directory counts.
    The z-curve interleaves the bit-ranks of both columns, so rows close
    in (x, y) land close in z — every file/row-group then covers a small
    rectangle of the (x, y) space and its parquet min/max stats exclude
    it from most point/range scans on either dimension. This is the
    layout story Delta's OPTIMIZE ZORDER applies at 100 TB; here it is
    one range-repartition + in-partition sort and a plain parquet write.

    Quantization is QUANTILE-rank based (one approxQuantile pass per
    column, 2^bits - 1 boundaries of config size; ranks via a
    higher-order filter against the boundary array), so skewed columns
    — the common case for telemetry values — still spread across the
    full curve; min-max scaling would collapse their dense region into
    a few buckets and lose the pruning on that dimension.

    Incremental deployment form: pass ``mode="append"`` with the table's
    persisted sketch (or none — it is loaded from the ``_zorder_sketch``
    sidecar written on the initial load). Appended batches are quantized
    against the SAME boundaries, so new files cover small rectangles of
    the same (x, y) space and pruning keeps working as the table grows —
    no re-clustering of history, no per-batch statistics scan. The
    sketch only needs recomputing when the value distribution drifts far
    enough that new data piles into few buckets (a maintenance decision,
    same as Delta's OPTIMIZE cadence).
    """
    from pyspark.sql import functions as F

    if sketch is None:
        if mode == "append" and os.path.exists(_sketch_path(path)):
            sketch = load_zorder_sketch(path)
        else:
            sketch = compute_zorder_sketch(df, col_x, col_y, bits)
    assert sketch["col_x"] == col_x and sketch["col_y"] == col_y, (
        "sketch was built for different columns"
    )
    z = interleave_bits(
        quantile_rank(F.col(col_x), sketch["bx"]),
        quantile_rank(F.col(col_y), sketch["by"]),
        sketch["bits"],
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
    save_zorder_sketch(path, sketch)
