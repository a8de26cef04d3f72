from pagerank_spark.algorithms.pagerank import PageRank, PageRankResult  # noqa: F401
