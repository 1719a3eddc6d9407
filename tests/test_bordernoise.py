"""GRD border-noise removal (SURVEY R5): LUT interpolation, denoise
threshold mask, Visvalingam-Whyatt border simplification."""

import numpy as np
from pyspark.sql import functions as F

from pyrosar_spark.operators.bordernoise import (
    border_from_mask,
    denoise_chip,
    remove_border_noise,
    vw_simplify,
)


def test_vw_keeps_corners():
    # an L-shaped line: the corner has the largest effective area and
    # must survive aggressive simplification
    pts = np.array([[0, 0], [1, 0.01], [2, 0.0], [3, 0.02], [4, 0], [4.5, 5], [5, 10]])
    out = vw_simplify(pts, 3)
    assert len(out) == 3
    assert out[0].tolist() == [0, 0] and out[-1].tolist() == [5, 10]
    assert 4 <= out[1][0] <= 4.6  # the knee survives


def test_vw_short_input_passthrough():
    pts = np.array([[0.0, 0.0], [1.0, 1.0]])
    assert np.array_equal(vw_simplify(pts, 5), pts)


def test_denoise_masks_border():
    rng = np.random.default_rng(1)
    dn = rng.uniform(1.0, 2.0, size=(40, 40))
    dn[:, :10] *= 0.05
    lut = np.full((4, 4), 0.001)
    power, mask = denoise_chip(dn, lut, threshold=0.5)
    assert mask[:, :10].mean() > 0.95  # border region masked
    assert mask[:, 20:].mean() < 0.05  # interior kept
    assert (power >= 0).all()
    border = border_from_mask(mask)
    assert border.shape == (40, 2)
    assert (border[:, 1] >= 9).all()


def test_remove_border_noise_operator(spark):
    chips = spark.createDataFrame(
        [("m1", 40, 40, 7), ("m2", 32, 48, 11)],
        "media_ref string, width int, height int, seed int",
    )
    out = remove_border_noise(chips).collect()
    by_ref = {r.media_ref: r for r in out}
    assert set(by_ref) == {"m1", "m2"}
    r = by_ref["m1"]
    assert r.n_masked > 0
    assert 2 <= r.border_points <= 8
    assert r.first_valid_col >= r.width // 4 - 1
    cols = np.frombuffer(bytes(r.border_cols), dtype="<f8")
    assert len(cols) == r.border_points
    # deterministic
    again = {x.media_ref: x for x in remove_border_noise(chips).collect()}
    assert bytes(again["m1"].border_cols) == bytes(r.border_cols)
