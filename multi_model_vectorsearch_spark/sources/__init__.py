from multi_model_vectorsearch_spark.sources.registry import TABLES, load_tables  # noqa: F401
