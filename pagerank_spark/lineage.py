"""Per-iteration lineage + metrics rows, persisted through the Catalog.

Schema (FIXTURES.md §5): one row per (run, iteration[, partition]) with rows
shuffled, L1 residual, wall time, and the checkpoint snapshot id, so any run
can be audited and resumed. Partition-level rows are optional (an extra small
job per iteration) — aggregate rows (partition_id = -1) are always written.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_TABLE = "lineage"


class LineageWriter:
    def __init__(self, spark: SparkSession, catalog, per_partition: bool = False):
        self.spark = spark
        self.catalog = catalog
        self.per_partition = per_partition

    def partition_counts(self, df: DataFrame) -> list[tuple[int, int]]:
        rows = (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        return [(int(r["pid"]), int(r["count"])) for r in rows]

    def log_iteration(
        self,
        run_id: str,
        iteration: int,
        rows_shuffled: int,
        residual_l1: float,
        wall_time_s: float,
        snapshot: str | None = None,
        extra: dict | None = None,
        partition_counts: list[tuple[int, int]] | None = None,
    ) -> None:
        rows = [
            (
                run_id,
                iteration,
                -1,
                int(rows_shuffled),
                float(residual_l1),
                float(wall_time_s),
                snapshot,
                json.dumps(extra or {}),
            )
        ]
        for pid, cnt in partition_counts or []:
            rows.append(
                (run_id, iteration, pid, cnt, float(residual_l1),
                 float(wall_time_s), snapshot, "{}")
            )
        df = self.spark.createDataFrame(
            rows,
            "run_id string, iteration int, partition_id int, rows_shuffled long, "
            "residual_l1 double, wall_time_s double, snapshot string, extra string",
        )
        self.catalog.write(df, LINEAGE_TABLE, mode="append")

    def read(self, run_id: str | None = None) -> DataFrame:
        df = self.catalog.read(self.spark, LINEAGE_TABLE)
        if run_id is not None:
            df = df.filter(F.col("run_id") == run_id)
        return df
