from songs_etl_spark.sources.catalog import TESTDATA_TABLES, load_table, register_views
from songs_etl_spark.sources.json_source import read_landing_json
from songs_etl_spark.sources.writers import overwrite_table

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "register_views",
    "read_landing_json",
    "overwrite_table",
]
