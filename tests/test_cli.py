"""Subprocess smoke test for the spark-submit CLI entry point
(pagerank_spark.cli): generate-pages -> build-graph -> pagerank --resume.

The reference drives everything through its argv parser
(/root/reference/Pagerank/src/pagerank32c.c:875-1004); this is the engine's
equivalent surface, exercised the way a cluster run would be launched.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*argv: str, timeout: int = 420) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-m", "pagerank_spark.cli", "--master", "local[4]",
         "--shuffle-partitions", "4", *argv],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stdout[-2000:]
    return json.loads(lines[-1])


@pytest.mark.slow
def test_cli_pipeline_end_to_end(tmp_path):
    pages = str(tmp_path / "pages")
    graph = str(tmp_path / "graph")
    warehouse = str(tmp_path / "wh")
    ranks = str(tmp_path / "ranks")

    r = run_cli("generate-pages", "--n", "300", "--output", pages)
    assert r["pages"] == 300

    r = run_cli("build-graph", "--pages", pages, "--output", graph)
    assert r["n_vertices"] > 0 and r["n_edges"] > 0

    r1 = run_cli(
        "--warehouse", warehouse, "pagerank",
        "--edges", f"{graph}/edges", "--max-iter", "3", "--eps", "0.0",
        "--run-id", "clismoke", "--output", ranks,
    )
    assert r1["iterations"] == 3 and r1["run_id"] == "clismoke"

    # resume from the checkpoint: continues AFTER iteration 3 to convergence
    r2 = run_cli(
        "--warehouse", warehouse, "pagerank",
        "--edges", f"{graph}/edges",
        "--run-id", "clismoke", "--resume", "--output", ranks,
    )
    assert r2["iterations"] > 3
    assert r2["final_delta"] < 1e-5


@pytest.mark.slow
def test_cli_golden_graph_file(tmp_path):
    out_txt = str(tmp_path / "ranks.txt")
    r = run_cli(
        "pagerank", "--graph-file",
        "/root/reference/Pagerank/src/test1.graph",
        "--text-output", out_txt,
    )
    assert r["iterations"] == 7
    import numpy as np

    golden = np.loadtxt("/root/reference/Pagerank/src/test1_pageranks.txt")
    mine = np.loadtxt(out_txt)
    assert np.abs(mine - golden).max() < 1e-6


def test_auto_dispatch_boundaries():
    from pagerank_spark.algorithms.pagerank import PageRank

    assert PageRank.dispatch_mode(1000) == "csr"
    assert PageRank.dispatch_mode(PageRank.AUTO_CSR_MAX_VERTICES) == "csr"
    assert PageRank.dispatch_mode(PageRank.AUTO_CSR_MAX_VERTICES + 1) == "dataframe"
