"""Reader/writer for the reference's binary ``.graph`` edge-list format.

Layout (reference loader /root/reference/Pagerank/src/pagerank32c.c:219-298):
  int32 N (nodes), int32 M (arcs), then M little-endian int32 pairs
  (sorg, dest) with **1-based** node ids.

The distributed read path goes through ``spark.read.format("binaryFile")`` +
``mapInArrow``-style chunk decoding so a directory of .graph shards scales;
ids are rebased to the engine's dense 0-based convention on the way in.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

EDGE_SCHEMA = StructType(
    [StructField("src", LongType(), False), StructField("dst", LongType(), False)]
)


def read_graph_file(
    spark: SparkSession, path: str, num_partitions: int | None = None
) -> tuple[DataFrame, int]:
    """Read one ``.graph`` file into an ``edges(src, dst)`` DataFrame (0-based).

    Returns (edges, n). The binary payload is decoded JVM-side via
    ``binaryFile`` + an Arrow batch iterator: one task per file; for multi-GB
    inputs, shard the graph into multiple ``.graph`` files and union the
    resulting DataFrames (one decode task each). The header (n, m) is read
    driver-side (8 bytes) — metadata only, not data movement.
    """
    with open(path, "rb") as f:
        n, m = struct.unpack("<ii", f.read(8))

    binary_df = spark.read.format("binaryFile").load(path).select("content")

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for buf in batch.column(0).to_pylist():
                arr = np.frombuffer(buf, dtype="<i4", offset=8).reshape(-1, 2)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(arr[:, 0].astype(np.int64) - 1),
                        pa.array(arr[:, 1].astype(np.int64) - 1),
                    ],
                    names=["src", "dst"],
                )

    edges = binary_df.mapInArrow(decode, EDGE_SCHEMA)
    if num_partitions:
        edges = edges.repartition(num_partitions, "src")
    return edges, n


def write_graph_file(path: str, edges: np.ndarray, n: int) -> None:
    """Write 0-based (m,2) edges to the reference binary layout (1-based)."""
    arr = np.asarray(edges, dtype=np.int64) + 1
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", n, arr.shape[0]))
        f.write(arr.astype("<i4").tobytes())


def save_pageranks_text(ranks_df: DataFrame, path: str) -> None:
    """Golden-compatible text writer: one ``%.14g`` per node, node-id order.

    Mirrors save_pageranks (/root/reference/Pagerank/src/pagerank32c.c:358-368).
    Collects to the driver — only for golden comparison at test scale.
    """
    rows = ranks_df.select("id", "rank").orderBy("id").collect()
    with open(path, "w") as f:
        for row in rows:
            f.write(f"{row['rank']:.14g}\n")


def edges_from_numpy(spark: SparkSession, edges: np.ndarray, num_partitions: int = 8) -> DataFrame:
    """Test helper: (m,2) int array -> edges DataFrame via Arrow."""
    arr = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    tbl = pa.table({"src": arr[:, 0], "dst": arr[:, 1]})
    df = spark.createDataFrame(tbl.to_pandas(), schema=EDGE_SCHEMA)
    return df.repartition(num_partitions, "src")


def vertices_df(spark: SparkSession, n: int, num_partitions: int = 8) -> DataFrame:
    """vertices(id) = 0..n-1 as a DataFrame (distributed range, no driver loop)."""
    return spark.range(0, n, 1, num_partitions).select(F.col("id").cast("long"))
