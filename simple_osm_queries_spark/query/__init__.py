from simple_osm_queries_spark.query.parser import parse_query  # noqa: F401
from simple_osm_queries_spark.query.planner import plan_query  # noqa: F401
