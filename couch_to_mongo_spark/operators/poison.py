"""Write-side poison isolation: per-row bisection of a failing kernel.

The reference isolates a poison document by bisecting a failed
``insertMany`` down to the single bad doc and logging its ``_id``
(reference: Mongo.java:250-261). The Spark-native rendering moves the
bisection INSIDE the task: a schema-preserving pandas kernel (text
normalizer, custom codec, validator) runs per Arrow batch via
``mapInPandas``; when a batch raises, the rows are binary-searched with
log2(batch) kernel retries until the offending rows are pinned. Good rows
flow on transformed; poison rows pass through UNtransformed with
``_poison_reason`` set, so the caller can quarantine them to the
dead-letter table and commit the healthy remainder — one batch never
fails because of one row, and no driver-side re-submission is needed
(the reference re-issues Mongo writes per half; here the halving is a
local pandas slice).

Scale: cost is O(rows) when nothing fails (one kernel call per Arrow
batch) and O(log batch_size) extra kernel calls per poisoned batch —
independent of cluster size, no extra Spark jobs or shuffles.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

POISON_COL = "_poison_reason"


def isolate_poison(
    df: DataFrame,
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    reason_col: str = POISON_COL,
) -> DataFrame:
    """Apply a schema-preserving pandas kernel with per-row failure
    isolation. Returns df's schema + a string ``reason_col``: NULL for
    rows the kernel transformed, the exception text for rows it could not
    process (those keep their original values)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(reason_col, T.StringType(), True)]
    )
    columns = [f.name for f in df.schema.fields]

    def run_or_bisect(pdf: pd.DataFrame) -> pd.DataFrame:
        try:
            out = kernel(pdf.copy())[columns]
            out[reason_col] = None
            return out
        except Exception as e:
            if len(pdf) <= 1:
                bad = pdf.copy()
                bad[reason_col] = f"{type(e).__name__}: {e}"
                return bad
            mid = len(pdf) // 2
            return pd.concat(
                [run_or_bisect(pdf.iloc[:mid]), run_or_bisect(pdf.iloc[mid:])],
                ignore_index=True,
            )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield run_or_bisect(pdf)

    return df.mapInPandas(gen, out_schema)
