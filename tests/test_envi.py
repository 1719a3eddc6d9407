"""ENVI raster read (DIMAP incidence last-resort, drivers.py:911-918).

Pure-decode goldens (no Spark) + the Spark-level fill cascade.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyrosar_spark.operators.envi import decode_envi, parse_envi_hdr


def _hdr(samples, lines, code, big=False, offset=0, extra=""):
    return (
        "ENVI\n"
        f"samples = {samples}\n"
        f"lines = {lines}\n"
        "bands = 1\n"
        f"header offset = {offset}\n"
        f"data type = {code}\n"
        "interleave = bsq\n"
        f"byte order = {1 if big else 0}\n" + extra
    )


def test_hdr_parse_defaults_and_unknown_keys():
    h = parse_envi_hdr("ENVI\nsamples = 3\nlines=2\ndata type = 4\nmap info = {x}\n")
    assert h == {
        "samples": 3, "lines": 2, "bands": 1, "offset": 0,
        "dtype_code": 4, "big_endian": False,
    }


@pytest.mark.parametrize("code,np_dt", [(4, "f4"), (2, "i2"), (5, "f8"), (12, "u2"), (1, "u1")])
@pytest.mark.parametrize("big", [False, True])
def test_decode_roundtrip(code, np_dt, big):
    vals = np.array([0, 1, 2, 250, 3, 4], dtype=np_dt)
    arr = vals.astype(("" if code == 1 else (">" if big else "<")) + np_dt)
    got = decode_envi(_hdr(3, 2, code, big=big), arr.tobytes())
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, vals.astype(np.float64))


def test_decode_header_offset_and_short_payload():
    vals = np.arange(6, dtype="<f4")
    payload = b"\xab" * 16 + vals.tobytes()
    got = decode_envi(_hdr(3, 2, 4, offset=16), payload)
    np.testing.assert_array_equal(got, vals.astype(np.float64))
    with pytest.raises(ValueError, match="short ENVI payload"):
        decode_envi(_hdr(3, 2, 4), vals.tobytes()[:-4])
    with pytest.raises(ValueError, match="unsupported ENVI data type"):
        decode_envi(_hdr(3, 2, 6), b"\0" * 48)


def test_fill_cascade_decodes_only_fallback_rows(spark):
    """Rows with metadata incidence never touch the raster table; NULL
    rows get mean-of-nonzero; an all-zero raster yields NULL (the
    reference's warn-and-NaN case)."""
    from pyrosar_spark.operators.envi import fill_incidence_from_rasters

    parsed = spark.createDataFrame(
        [(1, 35.5), (2, None), (3, None), (4, None)],
        "doc_id long, incidence double",
    )
    z = np.zeros(4, dtype="<f4")
    good = np.array([0.0, 10.0, 0.0, 20.0], dtype="<f4")
    rasters = spark.createDataFrame(
        [
            (2, _hdr(2, 2, 4), bytearray(good.tobytes())),
            (3, _hdr(2, 2, 4), bytearray(z.tobytes())),
            # doc 1 has metadata — its (corrupt) raster must never be read
            (1, _hdr(2, 2, 4), bytearray(b"\x00")),
        ],
        "doc_id long, hdr string, payload binary",
    )
    got = {
        r["doc_id"]: r["incidence"]
        for r in fill_incidence_from_rasters(parsed, rasters).collect()
    }
    assert got[1] == 35.5
    assert got[2] == 15.0
    assert got[3] is None   # all-zero raster
    assert got[4] is None   # no raster at all


def test_generator_expected_pixels_match_decode(spark):
    """The handoff split is honest: decoding (hdr, payload) reproduces
    the independently-stored e_px exactly, across all dtype/endian/
    offset rotations."""
    from pyrosar_spark.datagen import generate_incidence_rasters

    r = generate_incidence_rasters(spark, "/root/testdata/sf0.001").collect()
    assert len(r) > 50
    codes = set()
    for row in r:
        arr = decode_envi(row["hdr"], bytes(row["payload"]))
        np.testing.assert_array_equal(arr, np.array(row["e_px"], dtype=np.float64))
        codes.add(parse_envi_hdr(row["hdr"])["dtype_code"])
    assert codes == {4, 2, 5, 12}
