"""Native shared-library UDFs via ctypes — the reference's per-task
init + shared-lib acceleration pattern (external.py:28-52 documents
loading a ctypes library once per task and calling it from the map
function).

Spark mapping: the library handle is process-global in the Python
worker (loaded on first batch, reused for every subsequent batch that
worker executes — the exact analog of disco's once-per-task init), and
the call sites are Arrow-batched pandas UDFs, so the per-record
Python→C transition is the only overhead. A production library would
accept the numpy buffer pointer and process the whole batch in one
call (`arr.ctypes.data_as(...)`); libm's scalar cbrt keeps this demo
dependency-free while exercising the same loading/caching machinery.
"""

from __future__ import annotations

import ctypes

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from disco_spark.registry import query
from disco_spark.session import load_tables

_LIB_CACHE: dict[str, ctypes.CDLL] = {}


def _libm() -> ctypes.CDLL:
    """Load libm once per Python worker process (per-task init analog)."""
    lib = _LIB_CACHE.get("m")
    if lib is None:
        lib = ctypes.CDLL("libm.so.6")
        lib.cbrt.restype = ctypes.c_double
        lib.cbrt.argtypes = [ctypes.c_double]
        _LIB_CACHE["m"] = lib
    return lib


# DataType instance (not a DDL string): string return types are parsed
# through the active SparkContext, which doesn't exist at import time
@pandas_udf(DoubleType())
def native_cbrt(x: pd.Series) -> pd.Series:
    lib = _libm()
    return x.map(lambda v: lib.cbrt(float(v)))


@query(
    "native_lib_cbrt",
    # libm's cbrt and DuckDB's cbrt resolve to the same libm symbol on
    # this platform, so the comparison is bit-exact — which is the point:
    # the native path must not perturb values.
    oracle="SELECT doc_id, cbrt((doc_id + 2)::DOUBLE) AS cbrt_val FROM documents",
)
def native_lib_cbrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ctypes shared-library UDF end-to-end: load libm per worker, call
    it from an Arrow-batched pandas UDF over the documents table."""
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        native_cbrt((F.col("doc_id") + F.lit(2)).cast("double")).alias("cbrt_val"),
    )
