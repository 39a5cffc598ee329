"""lit_array (operators/_fastlit.py) must produce literals BIT-IDENTICAL
to the F.lit(list) form it replaces, for every real literal site's
values: the PQ codebook, the LSH hyperplanes, the IVF query vector, and
the simhash Hamming mask array. The optimization moves WHERE the literal
is built (one py4j round trip instead of one per element); the value and
type must not move at all."""

from __future__ import annotations

import struct
from itertools import combinations

import pytest

from pyspark.sql import functions as F

from yamon_spark.operators._fastlit import lit_array


def _bits(x) -> bytes:
    if isinstance(x, list):
        return b"".join(_bits(v) for v in x)
    if isinstance(x, float):
        return struct.pack("<d", x)
    return struct.pack("<q", x)


def _assert_identical(spark, values, sql_type):
    df = spark.range(1).select(
        F.lit(values).cast(sql_type).alias("old"), lit_array(values, sql_type).alias("new")
    )
    assert df.schema["old"].dataType == df.schema["new"].dataType
    row = df.first()
    assert _bits(row.old) == _bits(row.new)


def test_pq_codebook_bit_identical(spark):
    from yamon_spark.operators.similarity import pq_codebook

    for cb_j in pq_codebook(8, 16, 8):
        _assert_identical(spark, cb_j, "array<array<double>>")


def test_lsh_planes_bit_identical(spark):
    from yamon_spark.operators.similarity import lsh_hyperplanes

    for plane in lsh_hyperplanes(8, 64):
        _assert_identical(spark, plane, "array<double>")


def test_hamming_masks_bit_identical(spark):
    masks = [
        sum(1 << i for i in pos)
        for r in range(1, 3)
        for pos in combinations(range(32), r)
    ]
    _assert_identical(spark, [int(m) for m in masks], "array<bigint>")
    # 64-bit-wide masks exercise the full bigint range path
    masks64 = [1 << i for i in range(64 - 1)] + [(1 << 63) - 1]
    _assert_identical(spark, masks64, "array<bigint>")


def test_adversarial_doubles_bit_identical(spark):
    """Shortest-repr round-trip holds for awkward doubles: subnormals,
    many-digit fractions, negative zero, huge/tiny magnitudes."""
    vals = [
        0.1, -0.0, 1e-308, 5e-324, 1.7976931348623157e308,
        2.2250738585072014e-308, 1 / 3, -1 / 7, 6.02214076e23,
        0.30000000000000004, 123456789.123456789, -9.869604401089358,
    ]
    _assert_identical(spark, vals, "array<double>")


def test_rejects_non_numeric():
    with pytest.raises(TypeError):
        lit_array(["x"], "array<string>")
    with pytest.raises(TypeError):
        lit_array([True], "array<boolean>")
    with pytest.raises(ValueError):
        lit_array([float("nan")], "array<double>")
