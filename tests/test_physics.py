"""S1 resolution physics (F11), TDM pairing (J9), edge erosion (R6)."""

import numpy as np
from pyspark.sql import functions as F

from pyrosar_spark.operators.physics import (
    binary_erode,
    broadening_factor,
    erode_chip_masks,
    s1_resolution,
    tdm_pairing,
)

C = 299792458.0


def test_broadening_factor_lookup(spark):
    df = spark.createDataFrame([(0.52,), (0.75,), (0.99,)], "w double")
    out = [r.k for r in df.select(broadening_factor(F.col("w")).alias("k")).collect()]
    assert out[0] == 1.54 and out[1] == 1.13 and out[2] is None


def test_s1_resolution_golden(spark):
    # one scene, two sub-swaths with identical parameters:
    # slant-range res = 0.886*c/(2*b_rg)*k*(b_rg/lb_rg)
    rows = [
        ("d1", 0.52, 5.0e7, 5.0e7, 0.52, 300.0, 300.0, 10.0, 0.002, "SLANT_RANGE", 39.0),
        ("d1", 0.52, 5.0e7, 5.0e7, 0.52, 300.0, 300.0, 10.0, 0.002, "SLANT_RANGE", 39.0),
    ]
    schema = ("doc_id string, w_rg double, b_rg double, lb_rg double, w_az double, "
              "b_az double, lb_az double, sp_az double, ti_az double, "
              "image_geometry string, incidence double")
    df = spark.createDataFrame(rows, schema)
    r = s1_resolution(df).first()
    exp_rg = 0.886 * C / (2 * 5.0e7) * 1.54 * 1.0
    exp_az = 0.886 * (10.0 / 0.002) / 300.0 * 1.54 * 1.0
    assert abs(r.resolution_rg - exp_rg) < 1e-9
    assert abs(r.resolution_az - exp_az) < 1e-9
    # ground-range correction divides by sin(incidence)
    grd = df.withColumn("image_geometry", F.lit("GROUND_RANGE"))
    r2 = s1_resolution(grd).first()
    assert abs(r2.resolution_rg - exp_rg / np.sin(np.radians(39.0))) < 1e-9


def test_tdm_pairing(spark, scenes):
    master = scenes.where(F.col("doc_id") == "golden_s1")
    m = master.first()
    tdm = spark.createDataFrame(
        [("tdm_1", "golden_s1", "D", 0, "X", "00000000T000000")],
        "doc_id string, master_id string, orbit string, orbitNumber_abs int, "
        "acquisition_mode string, start string",
    ).withColumns({c: F.lit(None).cast("int") for c in
                   ["hh", "vv", "hv", "vh", "orbitNumber_rel", "cycleNumber",
                    "frameNumber", "samples", "lines"]}).withColumn(
        "stop", F.lit(None).cast("string"))
    out = tdm_pairing(tdm, scenes).first()
    assert out.orbit == m.orbit == "A"
    assert out.orbitNumber_abs == m.orbitNumber_abs
    assert out.acquisition_mode == m.acquisition_mode == "IW"
    assert out.start == m.start
    assert (out.hh, out.vv) == (m.hh, m.vv)


def test_binary_erode():
    mask = np.zeros((7, 7), dtype=bool)
    mask[1:6, 1:6] = True  # 5x5 block
    e1 = binary_erode(mask, 1)
    assert e1.sum() == 9  # 3x3 core
    e2 = binary_erode(mask, 2)
    assert e2.sum() == 1
    assert binary_erode(mask, 3).sum() == 0


def test_erode_chip_masks(spark):
    chips = spark.createDataFrame(
        [("m1", 30, 30, 5)], "media_ref string, width int, height int, seed int"
    )
    r = erode_chip_masks(chips, iterations=2).first()
    assert r.n_valid_after < r.n_valid_before <= 900
    # deterministic
    r2 = erode_chip_masks(chips, iterations=2).first()
    assert (r.n_valid_before, r.n_valid_after) == (r2.n_valid_before, r2.n_valid_after)
