"""Deterministic distributed synthetic graph generator for benchmarks.

Zipf(a)-skewed destination distribution over dense 0-based vertex ids —
the same hub-heavy shape real link graphs have (and the pages generator
produces), but generated directly as edges so benches can scale to 1e7+
edges without paying HTML generation. Per-partition counter-based RNG
(`default_rng([seed, pid])`) => same (seed, n, m, partitions) is
byte-identical, and generation parallelism matches read parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def synthetic_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    zipf_a: float = 1.5,
    num_partitions: int = 32,
    dangling_frac: float = 0.3,
) -> DataFrame:
    """-> edges(src, dst): Zipf-skewed dst, uniform src over the non-dangling
    prefix (vertices >= (1-dangling_frac)*n never appear as src)."""
    per = [n_edges // num_partitions] * num_partitions
    per[-1] += n_edges - sum(per)
    src_hi = max(1, int(n_vertices * (1.0 - dangling_frac)))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # 1.5M rows -> 12 MB per int64 array, safely below the 32 MiB glibc
        # mmap threshold: chunk buffers come from the reused heap instead of
        # fresh mmaps, whose first-touch faults serialize host-side on this
        # virtualized sandbox (measured: aggregate fresh-allocation bandwidth
        # collapses to ~1 GB/s at ANY parallelism, vs >300 GB/s pre-faulted)
        chunk = 1_500_000
        for batch in batches:
            for pid in batch["id"]:
                pid = int(pid)
                rng = np.random.default_rng([seed, pid])
                m = per[pid]
                for lo in range(0, m, chunk):
                    k = min(chunk, m - lo)
                    src = rng.integers(0, src_hi, size=k, dtype=np.int64)
                    z = rng.zipf(zipf_a, size=k).astype(np.int64)
                    dst = (z - 1) % n_vertices
                    yield pd.DataFrame({"src": src, "dst": dst})

    return spark.range(0, num_partitions, 1, num_partitions).mapInPandas(
        gen, "src long, dst long"
    )
