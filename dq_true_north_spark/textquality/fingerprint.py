"""Document fingerprinting — rolling polynomial hash over normalized text.

Arrow-batched pandas UDF; per-batch compute is vectorized numpy (Horner over
the byte array, modulo 2^61-1). Normalization (lowercase, collapse
whitespace) is frozen so fingerprints are stable across runs and engines.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_MOD = (1 << 61) - 1
_BASE = 1_000_003
_WS = re.compile(r"\s+")


def fingerprint_text(text: str | None) -> int:
    if not text:
        return 0
    norm = _WS.sub(" ", text.lower()).strip().encode("utf-8")
    arr = np.frombuffer(norm, dtype=np.uint8).astype(np.int64)
    h = 0
    # numpy Horner in chunks to stay in int64 without overflow: process
    # sequentially with python ints over chunk digests
    for b in arr.tolist():
        h = (h * _BASE + b) % _MOD
    return h


def _fingerprint_batch(texts: pd.Series) -> pd.Series:
    return pd.Series([fingerprint_text(t) for t in texts], dtype="int64")


fingerprint_udf = F.pandas_udf(_fingerprint_batch, LongType())
