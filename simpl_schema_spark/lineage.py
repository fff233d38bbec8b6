"""Resumable partitioned validation runs with per-partition lineage + metrics.

North rule: "resumable from checkpoint with per-partition lineage + metrics
tables, partitioning by warc_ts bucket + url hash".

Production mapping (Iceberg): each run appends one snapshot per completed
partition batch; resume = diff (table partitions) − (manifest partitions);
lineage/metrics are ordinary Iceberg tables appended transactionally with the
data.  Sandbox mapping (parquet, implemented here): the same contract over a
directory layout —

    <output>/violations/part_key=<v>/…      exploded violation rows
    <output>/metrics/…                      one row per (run_id, partition)
    <output>/manifest/…                     completed-partition ledger

Idempotence: a partition is skipped iff it appears in the manifest with
status='done'; a crashed run leaves no manifest row (manifest is written
AFTER the partition's data), so re-running reprocesses exactly the
incomplete partitions (writes are per-partition overwrites → no dup rows).

Scale notes: the partition loop is over PARTITION VALUES (e.g. crawl days),
not rows — hundreds of iterations, each a fully parallel Spark job
dynamically overwriting one partition directory.  A 100 TB table with ~365
daily partitions resumes at day granularity; bucket-level granularity is one
extra column in the same design.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass
from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .fsutil import delete_dir as _delete_dir
from .schema.schema import SimpleSchema
from .validation import with_violations

__all__ = [
    "PartitionedValidationRun",
    "run_partitioned_validation",
    "read_metrics",
]

# Characters Spark/Hive %-escape in partition DIRECTORY names
# (ExternalCatalogUtils.escapePathName: the Hive charToEscape set plus all
# ASCII control chars; space stays literal on POSIX).  Directory paths built
# by hand MUST apply the same escaping or they point at directories Spark
# never wrote — e.g. a stale-partition delete for part_key="day: 01" would
# target ".../part_key=day: 01" while Spark wrote ".../part_key=day%3A 01",
# leaving a crashed attempt's stale files to survive the rerun.
_PATH_ESCAPE_CHARS = frozenset('"#%\'*/:=?\\\x7f{[]^') | frozenset(
    chr(c) for c in range(0x20)
)


def _escape_partition_value(value) -> str:
    """Mirror Spark's ExternalCatalogUtils.escapePathName for one value."""
    if value is None:
        return "__HIVE_DEFAULT_PARTITION__"
    s = str(value)
    if not s:
        return "__HIVE_DEFAULT_PARTITION__"
    return "".join(
        f"%{ord(c):02X}" if c in _PATH_ESCAPE_CHARS else c for c in s
    )

#: ``wall_scope`` disambiguates the wall_sec reading: 'partition' rows time
#: one partition's job; 'batch' rows (single_pass mode) all share the whole
#: batch's wall — per-partition attribution doesn't exist in a single job.
#: MIGRATION NOTE: metrics written before wall_scope existed lack the
#: column; read the metrics table through :func:`read_metrics` (mergeSchema
#: + NULL→'partition' backfill) — a plain spark.read.parquet resolves the
#: schema from one footer and silently drops columns the winning file lacks.
_METRICS_DDL = (
    "run_id string, part_key string, n_rows bigint, n_violations bigint, "
    "n_invalid_rows bigint, wall_sec double, wall_scope string"
)




@dataclass
class PartitionedValidationRun:
    run_id: str
    completed: list[str]
    skipped: list[str]
    output_dir: str


def _manifest_done(spark: SparkSession, manifest_dir: str) -> set[str]:
    try:
        return {
            r.part_key
            for r in spark.read.option("mergeSchema", "true")
            .parquet(manifest_dir)
            .where(F.col("status") == "done")
            .select("part_key")
            .distinct()
            .collect()
        }
    except Exception:  # noqa: BLE001 — first run: no manifest yet
        return set()


def read_metrics(spark: SparkSession, output_dir: str) -> DataFrame:
    """Read a run's metrics table SAFELY across schema generations.

    Metrics rows appended before ``wall_scope`` existed lack that column;
    a plain ``spark.read.parquet`` resolves the schema from ONE footer and
    silently drops whichever columns that file is missing.  mergeSchema
    unions all footers, surfacing pre-migration rows with wall_scope NULL
    (semantically 'partition', the only mode that existed then)."""
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{output_dir}/metrics")
        .withColumn(
            "wall_scope", F.coalesce(F.col("wall_scope"), F.lit("partition"))
        )
    )


def run_partitioned_validation(
    df: DataFrame,
    schema: SimpleSchema,
    output_dir: str,
    *,
    partition_expr: Optional[F.Column] = None,
    partition_col: str = "part_key",
    id_cols: Iterable[str] = ("url",),
    run_id: Optional[str] = None,
    max_partitions: Optional[int] = None,
    single_pass: bool = False,
) -> PartitionedValidationRun:
    """Validate ``df`` partition-by-partition, resumably.

    ``partition_expr`` defaults to ``date(warc_ts)`` — the crawl-day
    partitioning of the north rule.  Each pending partition gets: violation
    rows written under ``violations/part_key=<v>/``, one metrics row, one
    manifest row.  Already-done partitions are skipped.

    ``single_pass=True`` processes ALL pending partitions in ONE Spark job
    (dynamic-partition overwrite + one grouped metrics aggregation) instead
    of one job per partition — the right shape when the input source can't
    prune partitions (each loop iteration would rescan the table) or when
    hundreds of partitions are pending.  Tradeoff: the job's output commits
    atomically, so a mid-run crash reprocesses every pending partition on
    resume (the loop resumes at single-partition granularity).
    """
    spark = df.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    if partition_expr is None:
        partition_expr = F.to_date(F.col("warc_ts")).cast("string")

    # The partition key is usually DERIVED (e.g. date(warc_ts)) and must not
    # reach the validator — it isn't part of the user's schema and would emit
    # a spurious keyNotInSchema row for every document.  Track whether we
    # injected it so we can drop it before validation and re-attach the value
    # as a literal on the output.  (If the caller partitions by a real data
    # column, it stays and is validated like any other column.)
    injected = partition_col not in df.columns
    keyed = df.withColumn(partition_col, partition_expr)
    all_parts = [
        r[0]
        for r in keyed.select(partition_col).distinct().orderBy(partition_col).collect()
    ]
    done = _manifest_done(spark, f"{output_dir}/manifest")
    pending = [p for p in all_parts if p not in done]
    if max_partitions is not None:
        pending = pending[:max_partitions]

    id_cols = list(id_cols)
    completed: list[str] = []

    if single_pass and pending:
        t0 = time.perf_counter()
        batch = keyed.where(F.col(partition_col).isin(*pending))
        if injected:
            validated = with_violations(
                batch.drop(partition_col), schema
            ).withColumn(partition_col, partition_expr)
        else:
            validated = with_violations(batch, schema)
        viols = validated.select(
            *id_cols,
            F.col(partition_col),
            F.explode("violations").alias("violation"),
        ).select(*id_cols, partition_col, "violation.*")
        # dynamic overwrite only rewrites partitions that PRODUCE rows this
        # run; a pending partition with zero violations would keep stale
        # files from a crashed earlier attempt — clear every pending
        # partition's directory explicitly first (Iceberg mapping: the
        # snapshot's overwrite of the pending partition set is atomic)
        for p in pending:
            _delete_dir(
                spark,
                f"{output_dir}/violations/{partition_col}="
                f"{_escape_partition_value(p)}",
            )
        (
            viols.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(f"{output_dir}/violations")
        )
        stats_rows = (
            validated.groupBy(partition_col)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.size("violations")).alias("n_violations"),
                F.sum((F.size("violations") > 0).cast("long")).alias(
                    "n_invalid_rows"
                ),
            )
            .collect()
        )
        wall = round(time.perf_counter() - t0, 3)
        by_part = {r[partition_col]: r for r in stats_rows}
        metrics = [
            (
                run_id,
                p,
                by_part[p].n_rows if p in by_part else 0,
                int(by_part[p].n_violations or 0) if p in by_part else 0,
                int(by_part[p].n_invalid_rows or 0) if p in by_part else 0,
                wall,
                "batch",
            )
            for p in pending
        ]
        spark.createDataFrame(
            metrics,
            _METRICS_DDL,
        ).withColumn("completed_at", F.current_timestamp()).write.mode(
            "append"
        ).parquet(f"{output_dir}/metrics")
        spark.createDataFrame(
            [(run_id, p, "done") for p in pending],
            "run_id string, part_key string, status string",
        ).withColumn("completed_at", F.current_timestamp()).write.mode(
            "append"
        ).parquet(f"{output_dir}/manifest")
        return PartitionedValidationRun(
            run_id=run_id,
            completed=list(pending),
            skipped=[p for p in all_parts if p in done],
            output_dir=output_dir,
        )

    for part in pending:
        t0 = time.perf_counter()
        slice_df = keyed.where(F.col(partition_col) == part)
        if injected:
            slice_df = slice_df.drop(partition_col)
        validated = with_violations(slice_df, schema)
        part_val = F.lit(part).alias(partition_col) if injected else F.col(partition_col)
        viols = validated.select(
            *id_cols,
            part_val,
            F.explode("violations").alias("violation"),
        ).select(*id_cols, partition_col, "violation.*")

        # partition-scoped overwrite → idempotent re-runs; escape the value
        # exactly as Spark's dynamic-partition writer would so the two run
        # modes produce one consistent directory layout (and reads via
        # spark.read.parquet(violations/) recover the original value)
        (
            viols.write.mode("overwrite")
            .parquet(
                f"{output_dir}/violations/{partition_col}="
                f"{_escape_partition_value(part)}"
            )
        )
        stats = validated.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.size("violations")).alias("n_violations"),
            F.sum((F.size("violations") > 0).cast("long")).alias("n_invalid_rows"),
        ).collect()[0]
        wall = time.perf_counter() - t0

        metrics_row = spark.createDataFrame(
            [
                (
                    run_id,
                    part,
                    stats.n_rows,
                    int(stats.n_violations or 0),
                    int(stats.n_invalid_rows or 0),
                    round(wall, 3),
                    "partition",
                )
            ],
            _METRICS_DDL,
        ).withColumn("completed_at", F.current_timestamp())
        metrics_row.write.mode("append").parquet(f"{output_dir}/metrics")

        spark.createDataFrame(
            [(run_id, part, "done")], "run_id string, part_key string, status string"
        ).withColumn("completed_at", F.current_timestamp()).write.mode(
            "append"
        ).parquet(f"{output_dir}/manifest")
        completed.append(part)

    return PartitionedValidationRun(
        run_id=run_id,
        completed=completed,
        skipped=[p for p in all_parts if p in done],
        output_dir=output_dir,
    )
