"""Name construction / parsing — JVM-side column expressions.

Reference semantics:
 - ``outname_base`` (``pyroSAR/drivers.py:584-608``): ``'{:_<4}'``-padded
   sensor and mode joined with orbit + start stamp, e.g.
   ``S1A__IW___A_20150222T170750``.
 - ``parse_datasetname`` (``pyroSAR/ancillary.py:237-279``) against the
   ``pyrosar`` product-name regex (``pyroSAR/patterns.py:18-28``).
 - SRTM HGT tile names (``pyroSAR/drivers.py:544-558``): 2-digit lat /
   3-digit lon with hemisphere letters, e.g. ``N51E011.hgt``.
 - DEM remote ids (``pyroSAR/auxdata.py:1396-1484``): per-grid naming,
   see :mod:`pyrosar_spark.operators.tiles`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Same structure as the reference's `pyrosar` pattern (patterns.py:18-28),
# rewritten with non-capturing groups so positional regexp_extract indices
# are stable: 1=outname_base 2=sensor 3=acquisition_mode 4=orbit 5=start
# 6=extensions 7=polarization 8=proc_steps 9=filetype
PYROSAR_PATTERN = (
    r"(?:.*[/\\]|)"
    r"((?:([A-Z0-9]{1,4})_+"
    r"([A-Z0-9]{1,4})_+"
    r"([AD])_"
    r"([0-9T]{15})"
    r"(?:_(\w*?)|)))"
    r"_*"
    r"(?:([HV]{2})_"
    r"([\w-]*)|)"
    r"((?:.tif|.nc|))$"
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def outname_base_col(
    sensor: Column | str,
    acquisition_mode: Column | str,
    orbit: Column | str,
    start: Column | str,
) -> Column:
    """``rpad(sensor,4,'_') _ rpad(mode,4,'_') _ orbit _ start``."""
    return F.concat_ws(
        "_",
        F.rpad(_c(sensor), 4, "_"),
        F.rpad(_c(acquisition_mode), 4, "_"),
        _c(orbit),
        _c(start),
    )


def parse_datasetname_cols(name: Column | str) -> Column:
    """Parse a pyroSAR product name into a struct column.

    NULL struct when the name does not match (``ancillary.py:258-259``);
    ``extensions`` '' → NULL, ``proc_steps`` split on '_', trailing
    underscores stripped from ``outname_base`` (``ancillary.py:262-270``).
    """
    c = _c(name)
    matched = c.rlike(PYROSAR_PATTERN)

    def grp(i: int) -> Column:
        return F.regexp_extract(c, PYROSAR_PATTERN, i)

    nullif_empty = lambda col: F.when(col != "", col)  # noqa: E731
    struct = F.struct(
        F.regexp_replace(grp(1), "_+$", "").alias("outname_base"),
        grp(2).alias("sensor"),
        grp(3).alias("acquisition_mode"),
        grp(4).alias("orbit"),
        grp(5).alias("start"),
        nullif_empty(grp(6)).alias("extensions"),
        nullif_empty(grp(7)).alias("polarization"),
        F.when(grp(7) != "", F.split(grp(8), "_")).alias("proc_steps"),
        nullif_empty(grp(9)).alias("filetype"),
        c.alias("filename"),
    )
    return F.when(matched, struct)


def hemi_id(
    value: Column, pos_letter: str, neg_letter: str, width: int, reverse: bool = False
) -> Column:
    """``{letter}{abs:0{width}d}`` (or reversed), vs reference
    ``auxdata.py:1403-1415``."""
    letter = F.when(value < 0, neg_letter).otherwise(pos_letter)
    num = F.lpad(F.abs(value).cast("string"), width, "0")
    return F.concat(num, letter) if reverse else F.concat(letter, num)


def hgt_tile_name(lat: Column, lon: Column) -> Column:
    """``N51E011.hgt``-style 1° tile name (``drivers.py:550-558``)."""
    return F.concat(hemi_id(lat, "N", "S", 2), hemi_id(lon, "E", "W", 3), F.lit(".hgt"))
