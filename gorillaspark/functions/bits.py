"""Vectorized bit-reinterpretation helpers (Arrow pandas UDFs).

Spark has no built-in Double.doubleToRawLongBits equivalent, and
``reflect``/``java_method`` stringify results — so the raw-bits view
used for bit-exact round-trip verification is done in Arrow batches
(zero-copy numpy ``.view``, no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def double_to_bits(s: pd.Series) -> pd.Series:
    """IEEE-754 bit pattern of a double column (raw, NaN-payload safe)."""
    return pd.Series(s.to_numpy(dtype=np.float64).view(np.int64))


@pandas_udf("double")
def bits_to_double(s: pd.Series) -> pd.Series:
    """Inverse view: long bit patterns → doubles."""
    return pd.Series(s.to_numpy(dtype=np.int64).view(np.float64))
