"""Schema evolution as column addition (SURVEY.md §1.2, FIXTURES.md §3).

The reference tolerates heterogeneous docs (4 of 5 carry Header/Analytics;
missing nested fields read as "" — reference: Mongo.java:402-405). The
Spark-native formalization: the table schema is the union of everything
seen; old rows null-fill new columns; batches are aligned by projection
before MERGE. Pure Column expressions — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def evolve_schema(table_schema: T.StructType, batch_schema: T.StructType) -> T.StructType:
    """Union of table schema and batch schema; new columns appended nullable.

    Type rules (Iceberg's safe-evolution set): a batch column narrower than
    the table's keeps the table type (upcast on align); a batch column
    STRICTLY WIDER (int->long, float->double, int/long->double) widens the
    table column — mid-stream type widening in the feed evolves the table
    instead of failing. Anything else raises.
    """
    fields = list(table_schema.fields)
    names = {f.name for f in fields}
    for bf in batch_schema.fields:
        if isinstance(bf.dataType, T.NullType):
            # an all-null batch column carries no type evidence: compatible
            # with any existing column; as a NEW column it arrives as string
            if bf.name not in names:
                fields.append(T.StructField(bf.name, T.StringType(), True))
            continue
        if bf.name in names:
            i, tf = next((i, f) for i, f in enumerate(fields) if f.name == bf.name)
            if tf.dataType == bf.dataType or _promotable(bf.dataType, tf.dataType):
                continue  # equal, or batch narrower: table type wins
            if _promotable(tf.dataType, bf.dataType):
                # batch is wider: widen the table column
                fields[i] = T.StructField(tf.name, bf.dataType, True)
                continue
            raise TypeError(
                f"incompatible evolution for column {bf.name}: "
                f"{tf.dataType.simpleString()} vs {bf.dataType.simpleString()}"
            )
        else:
            fields.append(T.StructField(bf.name, bf.dataType, True))
    return T.StructType(fields)


def _promotable(src: T.DataType, dst: T.DataType) -> bool:
    widening = {
        (T.IntegerType(), T.LongType()),
        (T.FloatType(), T.DoubleType()),
        (T.IntegerType(), T.DoubleType()),
        (T.LongType(), T.DoubleType()),
        (T.TimestampNTZType(), T.TimestampType()),
    }
    return (src, dst) in widening


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project df to exactly `schema`: missing columns null-filled, present
    columns cast to the target type, column order normalized."""
    cols = []
    present = set(df.columns)
    for f in schema.fields:
        if f.name in present:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
