"""Fixed-offset binary record parsing (CEOS-style metadata scans).

Reference: the CEOS drivers slice fixed byte ranges out of leader-file
records — e.g. the ERS dataset summary record start time at
``dss[1814:1838]`` (``pyroSAR/drivers.py:1000-1046``) and the PSR
records (``drivers.py:1195-1435``); ESA scenes mix key=value headers
with packed binary geolocation grids (``drivers.py:1622-1804``).

Spark shape: ASCII-encoded fields (the dominant CEOS case — numbers
are space-padded text) are pure JVM ``substring(binary)`` + decode +
try_cast. True packed integers (big-endian) go through one Arrow UDF
that unpacks the whole batch with numpy ``frombuffer`` — never
per-row ``struct.unpack``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class FieldSpec:
    """One fixed-offset field: ``offset`` is 0-based byte position."""

    name: str
    offset: int
    length: int
    kind: str  # 'str' | 'int' | 'float' | 'be_int'


def _ascii_slice(col: Column, offset: int, length: int) -> Column:
    # substring is 1-based; works directly on BinaryType
    return F.trim(F.decode(F.substring(col, offset + 1, length), "UTF-8"))


def extract_fields(df: DataFrame, bin_col: str, specs: list[FieldSpec]) -> DataFrame:
    """Project fixed-offset fields out of a binary record column."""
    cols = []
    for s in specs:
        if s.kind == "str":
            cols.append(_ascii_slice(F.col(bin_col), s.offset, s.length).alias(s.name))
        elif s.kind == "int":
            cols.append(
                _ascii_slice(F.col(bin_col), s.offset, s.length)
                .try_cast("bigint")
                .alias(s.name)
            )
        elif s.kind == "float":
            cols.append(
                _ascii_slice(F.col(bin_col), s.offset, s.length)
                .try_cast("double")
                .alias(s.name)
            )
        else:
            raise ValueError(f"use extract_be_ints for packed field {s.name}")
    return df.select("*", *cols)


def be_int_udf(offset: int, length: int):
    """Big-endian packed integer at a fixed offset, batch-unpacked."""

    @F.pandas_udf(T.LongType())
    def unpack(b: pd.Series) -> pd.Series:
        vals = np.empty(len(b), dtype=np.int64)
        for i, buf in enumerate(b):
            if buf is None or len(buf) < offset + length:
                vals[i] = 0
            else:
                vals[i] = int.from_bytes(bytes(buf[offset : offset + length]), "big")
        return pd.Series(vals)

    return unpack


def _unpack_be_ints(df: DataFrame, bin_col: str, specs: list[FieldSpec]) -> DataFrame:
    out = df
    for s in specs:
        out = out.withColumn(s.name, be_int_udf(s.offset, s.length)(F.col(bin_col)))
    return out


def extract_be_ints(df: DataFrame, bin_col: str, specs: list[FieldSpec]) -> DataFrame:
    """Big-endian int fields (packed CEOS prefix words)."""
    return _unpack_be_ints(df, bin_col, specs)


# the ERS/ASAR dataset-summary fields exercised by the reference's
# CEOS_ERS.scanMetadata (drivers.py:1000-1046): ASCII text at fixed
# offsets inside the DSS record
ERS_DSS_FIELDS = [
    FieldSpec("start_time", 1814, 24, "str"),
    FieldSpec("stop_time", 1838, 24, "str"),
    FieldSpec("orbit_number", 444, 8, "int"),
    FieldSpec("incidence_center", 484, 8, "float"),
]
