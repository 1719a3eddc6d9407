"""CEOS fixed-offset binary extraction (F8) + geolocation grids (F17/A9)."""

from pyspark.sql import functions as F

from pyrosar_spark.operators.binparse import FieldSpec, extract_be_ints, extract_fields
from pyrosar_spark.operators.geogrid import geolocation_grid, incidence_stats


def _record() -> bytes:
    buf = bytearray(b" " * 2000)
    buf[444:452] = b"   12345"
    buf[484:492] = b"   23.17"
    buf[1814:1838] = b"19960401T120000.000     "
    buf[0:4] = (77).to_bytes(4, "big")
    return bytes(buf)


def test_extract_ascii_fields(spark):
    df = spark.createDataFrame([(bytearray(_record()),)], "rec binary")
    specs = [
        FieldSpec("orbit_number", 444, 8, "int"),
        FieldSpec("incidence", 484, 8, "float"),
        FieldSpec("start_time", 1814, 24, "str"),
    ]
    row = extract_fields(df, "rec", specs).first()
    assert row.orbit_number == 12345
    assert row.incidence == 23.17
    assert row.start_time == "19960401T120000.000"


def test_extract_be_int(spark):
    df = spark.createDataFrame([(bytearray(_record()),)], "rec binary")
    row = extract_be_ints(df, "rec", [FieldSpec("rec_len", 0, 4, "be_int")]).first()
    assert row.rec_len == 77


def test_geolocation_grid(scenes):
    g = geolocation_grid(scenes.where(F.col("doc_id") == "golden_s1"), 2, 11)
    rows = g.collect()
    assert len(rows) == 22
    lons = [r.lon for r in rows]
    lats = [r.lat for r in rows]
    assert min(lons) == 8.017178 and max(lons) == 12.0268
    assert min(lats) == 50.295261 and max(lats) == 52.183979
    first = [r for r in rows if r.line == 0 and r.pixel == 0][0]
    assert first.incidenceAngle == 19.0
    stats = incidence_stats(g).first()
    assert (stats.incidence_min, stats.incidence_max) == (19.0, 45.0)
    # corner pixel indices hit the image frame
    assert max(r.pixel for r in rows) == 25367
    assert max(r.line for r in rows) == 16684
