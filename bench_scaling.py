#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule.

The rule asks for >=0.8 throughput scaling efficiency from N to 4N executors.
No real cluster exists in this sandbox, so the proxy (per the driver
instruction) is the SAME PageRank job on the SAME input at local[8] vs
local[32], each in a fresh JVM subprocess:

    eff = (throughput@32 / throughput@8) / (32 / 8)

For csr:files mode the graph is PACKED ONCE (manifest + block files in a
shared scratch dir); both parallelism levels then iterate over identical
packed bytes with the same block count, so the only variable is the number
of concurrently running tasks — exactly what a cluster-size change varies.
Per-iteration times are medians excluding the warm-up iteration (this host
shows +/-50% single-shot noise; see session notes in session.py).

Writes BENCH/BASELINE.md and prints one JSON line. Graph sizing: small-n /
large-m so per-iteration work dominates the ~0.2-0.35 s per-job floor of a
Python-worker stage (measured on this host; the floor does not shrink with
cores, so an iteration must be several seconds at local[32] for the
efficiency number to measure the engine rather than the scheduler).

Usage: python bench_scaling.py [--edges 8000000000] [--vertices 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pagerank_spark.session import get_spark
from pagerank_spark.sources.synthetic import synthetic_edges
from pagerank_spark.algorithms.pagerank import PageRank

cores = int(sys.argv[1]); n = int(sys.argv[2]); m = int(sys.argv[3]); mode = sys.argv[4]
scratch = sys.argv[5] if len(sys.argv) > 5 and sys.argv[5] != "-" else None
nblocks = int(sys.argv[6]) if len(sys.argv) > 6 else None
iters = int(sys.argv[7]) if len(sys.argv) > 7 else 8
storage = "cells"
if ":" in mode:
    mode, storage = mode.split(":", 1)
spark = get_spark("scaling", master=f"local[{{cores}}]", shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
if mode == "pipeline":
    # end-to-end link-graph job: generate pages -> Arrow-UDF extraction ->
    # dense-ID remap -> edges -> converged PageRank (n = page count)
    from pagerank_spark.sources.pages import generate_pages
    from pagerank_spark.graph.build import build_link_graph
    t0 = time.time()
    pages = generate_pages(spark, n, seed=42, num_partitions=cores * 4).persist()
    pages.count()
    g = build_link_graph(pages)
    res = PageRank(mode="broadcast", max_iter=5, eps=0.0).run(g.edges, g.n)
    res.ranks.count()
    wall = time.time() - t0
    print(json.dumps({{"cores": cores, "iter_sec_med": wall,
                      "edges_per_sec_per_iter": n / wall,
                      "iter_seconds": [wall], "unit": "pages/sec end-to-end"}}))
else:
    t_pack0 = time.time()
    edges = synthetic_edges(spark, n, m, seed=42, num_partitions=cores)
    pr = PageRank(mode=mode, csr_storage=storage, max_iter=iters, eps=0.0,
                  scratch_dir=scratch, reuse_pack=scratch is not None,
                  num_blocks=nblocks)
    res = pr.run(edges, n)
    secs = sorted(res.iter_seconds[1:])  # drop warm-up iteration
    med = secs[len(secs) // 2]  # median: robust to noisy-neighbor spikes
    print(json.dumps({{"cores": cores, "iter_sec_med": med,
                      "edges_per_sec_per_iter": m / med,
                      "wall_total": round(time.time() - t_pack0, 1),
                      "iter_seconds": [round(s, 3) for s in res.iter_seconds]}}))
spark.stop()
"""


def run(cores: int, n: int, m: int, mode: str, repo: str,
        scratch: str | None, nblocks: int | None, iters: int) -> dict:
    code = RUNNER.format(repo=repo)
    argv = [sys.executable, "-c", code, str(cores), str(n), str(m), mode,
            scratch or "-", str(nblocks or 0), str(iters)]
    out = subprocess.run(argv, capture_output=True, text=True, timeout=7200)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"runner failed (cores={cores}):\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=8_000_000_000)
    ap.add_argument("--vertices", type=int, default=100_000)
    ap.add_argument("--mode", default="csr:files")
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--keep-scratch", action="store_true")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.abspath(__file__))

    scratch = None
    nblocks = None
    if args.mode == "csr:files":
        # pack once at a fixed block count; both configs read the same bytes
        scratch = tempfile.mkdtemp(prefix="prscale_")
        nblocks = args.hi

    try:
        # hi first: packs (at hi parallelism) and warms the page cache
        r_hi = run(args.hi, args.vertices, args.edges, args.mode, repo,
                   scratch, nblocks, args.iters)
        r_lo = run(args.lo, args.vertices, args.edges, args.mode, repo,
                   scratch, nblocks, args.iters)
    finally:
        if scratch and not args.keep_scratch:
            shutil.rmtree(scratch, ignore_errors=True)

    eff = (r_hi["edges_per_sec_per_iter"] / r_lo["edges_per_sec_per_iter"]) / (
        args.hi / args.lo
    )
    result = {
        "metric": "pagerank_scaling_efficiency",
        "mode": args.mode,
        "n_vertices": args.vertices,
        "n_edges": args.edges,
        "lo": r_lo,
        "hi": r_hi,
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — scaling-efficiency evidence (north rule)

Proxy for the N -> 4N executor criterion (no real cluster in this sandbox):
identical PageRank job (mode={args.mode}), identical deterministic input
({args.vertices:,} vertices, {args.edges:,} Zipf-skewed edges, seed 42,
packed ONCE into {nblocks or 'n/a'} blocks shared by both configs), run in
fresh JVMs at local[{args.lo}] and local[{args.hi}]. Per-iteration seconds are
medians excluding the warm-up iteration.

| config | median iter (s, excl. warm-up) | edges/sec per iteration |
|---|---|---|
| local[{args.lo}] | {r_lo['iter_sec_med']:.3f} | {r_lo['edges_per_sec_per_iter']:,.0f} |
| local[{args.hi}] | {r_hi['iter_sec_med']:.3f} | {r_hi['edges_per_sec_per_iter']:,.0f} |

**Scaling efficiency = ({r_hi['edges_per_sec_per_iter']:,.0f} / {r_lo['edges_per_sec_per_iter']:,.0f}) / {args.hi // args.lo}
= {eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"})

Raw per-iteration seconds:
- local[{args.lo}]: {[round(s, 2) for s in r_lo['iter_seconds']]}
- local[{args.hi}]: {[round(s, 2) for s in r_hi['iter_seconds']]}

Sizing rationale: a Python-worker Spark stage has a measured per-job floor of
~0.21 s at local[8] / ~0.35 s at local[32] on this host (scheduling + Arrow
round-trip; it does not shrink with cores). The edge count is chosen so the
local[32] iteration is >= ~10x that floor, i.e. the efficiency number measures
SpMV throughput, not scheduler latency — matching the 10^12-edge regime where
fixed costs vanish.

Generated by `python bench_scaling.py --mode {args.mode} --edges {args.edges}
--vertices {args.vertices} --lo {args.lo} --hi {args.hi}`.
"""
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
