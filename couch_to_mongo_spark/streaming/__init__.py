from couch_to_mongo_spark.streaming.cdc import CdcPipeline, SchemaDrift  # noqa: F401
from couch_to_mongo_spark.streaming.lineage import LineageLog  # noqa: F401
