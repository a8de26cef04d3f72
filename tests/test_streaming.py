"""Structured Streaming: incremental ingest == batch, watermark semantics,
exactly-once resume, stateful incremental degrees.

The oracle for every test is the BATCH twin on the same rows — the
strongest check available for streaming (the driver's DuckDB gate can't see
streaming sources)."""

from __future__ import annotations

import glob
import os
import shutil
import time
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from pagerank_spark.functions.extract import extract_outlinks
from pagerank_spark.sources.pages import _EPOCH, PAGES_SCHEMA, generate_pages
from pagerank_spark.streaming import (
    crawl_stats,
    first_seen_pages,
    incremental_outdegree,
    stream_edges,
    stream_pages,
    write_edge_stream,
)

_MTIME0 = time.time() - 3600


def _land(df, land_dir: str, name: str, order: int) -> None:
    """Write df as one parquet file in land_dir; mtime encodes arrival order
    (the file stream source processes oldest-mtime first)."""
    stage = f"{land_dir}__stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    os.makedirs(land_dir, exist_ok=True)
    dst = os.path.join(land_dir, f"{name}.parquet")
    shutil.move(part, dst)
    shutil.rmtree(stage)
    t = _MTIME0 + 10 * order
    os.utime(dst, (t, t))


def _drain(stream_df, name: str, ckpt: str, mode: str = "append"):
    """Run a streaming DataFrame to a memory sink until the backlog drains."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)


def _pages_at(spark, rows):
    """Minimal page rows (url, warc_ts) with inert html."""
    data = [(u, t, b"<html></html>", "", "en") for u, t in rows]
    return spark.createDataFrame(data, PAGES_SCHEMA)


def _assert_same_rows(got, want):
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_edges_match_batch_and_resume_exactly_once(spark, tmp_path):
    pages = generate_pages(spark, 400, seed=7, num_partitions=4).cache()
    land = str(tmp_path / "land")
    out = str(tmp_path / "edges_out")
    ckpt = str(tmp_path / "ckpt")
    cuts = [_EPOCH + timedelta(seconds=17 * k) for k in (100, 200, 300)]

    _land(pages.filter(F.col("warc_ts") < cuts[0]), land, "b0", 0)
    _land(
        pages.filter((F.col("warc_ts") >= cuts[0]) & (F.col("warc_ts") < cuts[1])),
        land, "b1", 1,
    )
    _land(
        pages.filter((F.col("warc_ts") >= cuts[1]) & (F.col("warc_ts") < cuts[2])),
        land, "b2", 2,
    )

    edges = stream_edges(stream_pages(spark, land, max_files_per_trigger=1))
    q = write_edge_stream(edges, out, ckpt)
    q.awaitTermination()
    # maxFilesPerTrigger=1 -> one micro-batch per landed file
    assert sum(1 for p in q.recentProgress if p["numInputRows"] > 0) == 3

    got = spark.read.parquet(out).select("src_url", "dst_url")
    want = extract_outlinks(pages.filter(F.col("warc_ts") < cuts[2]))
    _assert_same_rows(got, want)

    # land one more file and RESUME from the same checkpoint: only the new
    # file is processed (exactly-once), output = batch over all four files
    _land(pages.filter(F.col("warc_ts") >= cuts[2]), land, "b3", 3)
    q2 = write_edge_stream(
        stream_edges(stream_pages(spark, land, max_files_per_trigger=1)), out, ckpt
    )
    q2.awaitTermination()
    assert sum(1 for p in q2.recentProgress if p["numInputRows"] > 0) == 1
    _assert_same_rows(
        spark.read.parquet(out).select("src_url", "dst_url"),
        extract_outlinks(pages),
    )
    pages.unpersist()


def test_crawl_stats_watermark_finality_and_late_rows(spark, tmp_path):
    land = str(tmp_path / "land")
    # batch 0: host a at 10:00/10:10, host b at 10:20 -> watermark 09:50
    _land(
        _pages_at(spark, [
            ("https://a.example/1", _ts(10, 0)),
            ("https://a.example/2", _ts(10, 10)),
            ("https://b.example/1", _ts(10, 20)),
        ]),
        land, "b0", 0,
    )
    # batch 1: 13:00 row advances watermark to 12:30 (closes the 10:00
    # window); 10:05 row is late but INSIDE the 09:50 horizon -> counted
    _land(
        _pages_at(spark, [
            ("https://c.example/1", _ts(13, 0)),
            ("https://a.example/3", _ts(10, 5)),
        ]),
        land, "b1", 1,
    )
    # batch 2: 09:00 row is behind the 12:30 watermark -> beyond horizon
    _land(_pages_at(spark, [("https://a.example/4", _ts(9, 0))]), land, "b2", 2)

    stats = crawl_stats(
        stream_pages(spark, land, max_files_per_trigger=1),
        window="1 hour", watermark="30 minutes",
    )
    _drain(stats, "crawl_stats_t", str(tmp_path / "ckpt"))

    got = {
        (r["window_start"], r["host"]): r["n_pages"]
        for r in spark.table("crawl_stats_t").collect()
    }
    t10 = _ts(10, 0).replace(tzinfo=None)
    # guaranteed semantics (Spark's watermark contract is one-directional):
    # the in-horizon late row IS counted in its finalized window...
    assert got[(t10, "a.example")] == 3
    assert got[(t10, "b.example")] == 1
    # ...and the still-open 13:00 window is never emitted in append mode
    assert all(w < _ts(13, 0).replace(tzinfo=None) for (w, _h) in got)
    # The beyond-horizon 09:00 row has NO drop guarantee: with the Spark 4
    # default statefulOperator.allowMultiple=true, late filtering uses the
    # PREVIOUS batch's watermark, so it lands in its own (immediately
    # finalized) window; with allowMultiple=false it is dropped. Either way
    # it must never contaminate another window.
    extra = set(got) - {(t10, "a.example"), (t10, "b.example")}
    assert extra <= {(_ts(9, 0).replace(tzinfo=None), "a.example")}
    if extra:
        assert got[(_ts(9, 0).replace(tzinfo=None), "a.example")] == 1


def test_first_seen_pages_drops_recrawls(spark, tmp_path):
    land = str(tmp_path / "land")
    _land(
        _pages_at(spark, [
            ("https://a.example/1", _ts(10, 0)),
            ("https://b.example/1", _ts(10, 10)),
        ]),
        land, "b0", 0,
    )
    _land(
        _pages_at(spark, [
            ("https://a.example/1", _ts(11, 0)),   # recrawl -> dropped
            ("https://c.example/1", _ts(11, 10)),  # new -> kept
        ]),
        land, "b1", 1,
    )
    dedup = first_seen_pages(
        stream_pages(spark, land, max_files_per_trigger=1), watermark="2 hours"
    ).select("url", "warc_ts")
    _drain(dedup, "first_seen_t", str(tmp_path / "ckpt"))

    got = {(r["url"], r["warc_ts"]) for r in spark.table("first_seen_t").collect()}
    assert got == {
        ("https://a.example/1", _ts(10, 0).replace(tzinfo=None)),
        ("https://b.example/1", _ts(10, 10).replace(tzinfo=None)),
        ("https://c.example/1", _ts(11, 10).replace(tzinfo=None)),
    }


def test_incremental_outdegree_matches_batch(spark, tmp_path):
    pages = generate_pages(spark, 200, seed=11, num_partitions=4).cache()
    land = str(tmp_path / "land")
    cut = _EPOCH + timedelta(seconds=17 * 100)
    _land(pages.filter(F.col("warc_ts") < cut), land, "b0", 0)
    _land(pages.filter(F.col("warc_ts") >= cut), land, "b1", 1)

    deg = incremental_outdegree(
        stream_edges(stream_pages(spark, land, max_files_per_trigger=1))
    )
    _drain(deg, "inc_outdeg_t", str(tmp_path / "ckpt"), mode="update")

    # update mode emits the running count per touched key each micro-batch;
    # counts are monotone, so max == final state
    got = (
        spark.table("inc_outdeg_t")
        .groupBy("src_url")
        .agg(F.max("outdeg").alias("outdeg"))
    )
    want = extract_outlinks(pages).groupBy("src_url").agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    _assert_same_rows(got, want)
    pages.unpersist()
