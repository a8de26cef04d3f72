"""Custom stateful streaming operator: incremental out-degree maintenance.

``incremental_outdegree`` keeps a running out-degree per source url across
micro-batches with ``applyInPandasWithState`` — the Arrow-batched stateful
API (state lives in the executor state store, grouped rows arrive as pandas
DataFrames). After each micro-batch it emits the updated (src_url, outdeg)
rows, so a downstream consumer always has the current degree table without
rescanning the edge history — the streaming twin of
``pagerank_spark.graph.degrees.out_degrees``.

Scale notes: one shuffle per micro-batch on src_url into the state store;
state is one long per distinct source url (O(V), partitioned across
executors — the same O(V)-per-key footprint every stateful streaming agg
has). Emission is update-mode (only keys touched by the batch), so output
volume tracks batch size, not state size.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "src_url string, outdeg long"
STATE_SCHEMA = "outdeg long"


def _update_outdegree(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    count = state.get[0] if state.exists else 0
    for pdf in pdfs:
        count += len(pdf)
    state.update((count,))
    yield pd.DataFrame({"src_url": [key[0]], "outdeg": [count]})


def incremental_outdegree(edges: DataFrame) -> DataFrame:
    """Streaming (src_url, dst_url, ...) -> running (src_url, outdeg).

    Use with ``outputMode("update")``: each micro-batch emits one row per
    source url that gained edges, carrying its cumulative out-degree.
    """
    return edges.groupBy("src_url").applyInPandasWithState(
        _update_outdegree,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
