from couch_to_mongo_spark.functions.normalize import (  # noqa: F401
    normalize_text,
    normalize_text_py,
)
