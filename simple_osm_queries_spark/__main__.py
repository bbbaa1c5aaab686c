from simple_osm_queries_spark.cli import main

main()
