"""Vectorized pandas UDAFs (GROUPED_AGG) — the aggregate face of the
pandas-UDF surface: whole groups arrive as Arrow-backed Series, the
return value is one scalar per group, and Spark runs partial/final
aggregation around it like any built-in.

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf resolves the type hints at decoration time and PEP-563
string annotations defeat that resolution.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def sum_log_q6(v: pd.Series) -> int:
    """Sum of 1e-6-quantized natural logs: each value's log becomes an
    exact int64 BEFORE the group sum, so the aggregate is
    order-independent and hash-identical to a SQL
    SUM(floor(ln(x)*1e6 + 0.5)) — the construction that lets a Python
    aggregate pass the cross-engine oracle."""
    x = np.log(v.to_numpy(dtype="float64"))
    return int(np.floor(x * 1e6 + 0.5).astype("int64").sum())


@pandas_udf("long")
def n_rows(v: pd.Series) -> int:
    """Group-size companion UDAF — Spark refuses to mix GROUPED_AGG
    pandas UDFs with built-in aggregates in one agg() call, so the
    count rides the same Arrow exchange."""
    return len(v)
