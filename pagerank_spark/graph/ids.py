"""Dense-ID assignment: url (or any key) -> contiguous 0-based long id.

The reference's node-id space is 1..N baked into the file format
(src/pagerank32c.c:219-230); the engine builds the equivalent dictionary from
arbitrary string keys.

Scalable two-phase scheme (no global window, no single-partition sort):

  1. distinct keys -> repartitionByRange(key) -> sortWithinPartitions(key),
     pinned with an eager localCheckpoint so both passes see the same layout.
  2. pass A: per-partition counts (tiny: P rows) -> driver computes prefix
     offsets. pass B: mapInPandas assigns offset[pid] + local position.

Because range partitions are ordered and each is sorted, ids equal the global
sort rank of the key — fully deterministic regardless of the sampled range
boundaries, at any parallelism. A `method="window"` path (row_number over a
single-partition window) exists for tiny inputs and as a cross-check oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    key: str = "url",
    num_partitions: int | None = None,
    method: str = "distributed",
) -> DataFrame:
    """Return a dictionary DataFrame (key, id: long), id = sort rank of key."""
    if method == "window":
        return df.select(key).distinct().select(
            F.col(key),
            (F.row_number().over(Window.orderBy(key)) - 1).cast("long").alias("id"),
        )

    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = (
        df.select(key)
        .distinct()
        .repartitionByRange(p, F.col(key))
        .sortWithinPartitions(key)
        .localCheckpoint(eager=True)
    )
    counts = dict(
        keys.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    offsets = {}
    acc = 0
    for pid in range(p):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    b_offsets = spark.sparkContext.broadcast(offsets)

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        pos = b_offsets.value[pid]
        for batch in batches:
            n = len(batch)
            out = pd.DataFrame({key: batch[key], "id": range(pos, pos + n)})
            pos += n
            yield out

    return keys.mapInPandas(tag, f"{key} string, id long")
