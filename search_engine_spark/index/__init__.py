from search_engine_spark.index.build import IndexTables, build_index  # noqa: F401
