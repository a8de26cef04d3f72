"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def set_checksum(df: DataFrame, *cols: str) -> tuple[int, int]:
    """Order-insensitive fingerprint of a DataFrame treated as a SET of rows:
    (row count, bit_xor of xxhash64 over ``cols``). One cheap scan, no join;
    overflow-free (bit_xor) so Spark 4 ANSI mode can't reject it. Used by the
    connected-components and label-propagation convergence checks."""
    row = df.agg(
        F.count(F.lit(1)).alias("c"),
        F.coalesce(
            F.expr(f"bit_xor(xxhash64({', '.join(cols)}))"), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row["c"]), int(row["h"])
