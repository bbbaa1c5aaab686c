from simple_osm_queries_spark.functions import cells, geometry, natural_sort  # noqa: F401
