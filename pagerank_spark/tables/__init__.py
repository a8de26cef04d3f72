from pagerank_spark.tables.catalog import Catalog, TableMeta  # noqa: F401
