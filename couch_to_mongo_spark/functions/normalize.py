"""Transcript text normalization — the engine's single Python kernel.

The reference passes documents through byte-for-byte (reference:
Couch.java:295 ``Document.parse(row.getDoc())``); our input_hint instead
requires per-turn text equality under stable turn ordering, so the engine
normalizes text once at ingest: Unicode NFC + collapse runs of whitespace
to single spaces + strip. Implemented as an Arrow-vectorized
``pandas_udf`` (Series -> Series) — no per-row Python anywhere
(SURVEY.md §2.12). ``normalize_text_py`` is the plain-Python oracle twin
used by parity tests and oracle.py.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS = re.compile(r"\s+")


def normalize_text_py(s: str | None) -> str | None:
    """Single-value oracle implementation (must match the UDF bit-for-bit)."""
    if s is None:
        return None
    return _WS.sub(" ", unicodedata.normalize("NFC", s)).strip()


def normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized normalizer over a pandas Series: NFC, whitespace
    collapse, strip. Shared by the pandas_udf and the poison-isolating
    mapInPandas kernel."""
    # str accessor ops are C-implemented in pandas; NFC needs a map but
    # stays inside one Arrow batch (no per-row Python UDF round trips).
    out = s.map(lambda v: unicodedata.normalize("NFC", v) if v is not None else None)
    return out.str.replace(_WS, " ", regex=True).str.strip()


@F.pandas_udf(T.StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """Vectorized normalizer: NFC, whitespace collapse, strip."""
    return normalize_series(s)


def normalize_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Schema-preserving pandas kernel form (for
    :func:`couch_to_mongo_spark.operators.poison.isolate_poison`)."""
    if "text" in pdf.columns:
        pdf = pdf.assign(text=normalize_series(pdf["text"]))
    return pdf
