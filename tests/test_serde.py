"""Golden byte-vector tests for the DDSketch wire codecs.

Vectors are taken verbatim from the reference test suite
(/root/reference/src/serde.rs:172-301,340-497) so the Python codecs are
byte-identical to the reference implementation.
"""

import pytest

from sketches_rust_spark.kernel import serde
from sketches_rust_spark.kernel.serde import Input

VAR_DOUBLES = [
    (0.0, [0]),
    (1.0, [2]),
    (2.0, [3]),
    (3.0, [4]),
    (4.0, [132, 64]),
    (5.0, [5]),
    (6.0, [133, 64]),
    (7.0, [6]),
    (8.0, [134, 32]),
    (9.0, [134, 64]),
    (4.503599627370494e15, [231, 255, 255, 255, 255, 255, 255, 255, 128]),
    (4.503599627370495e15, [104]),
    (4.503599627370496e15, [232, 128, 128, 128, 128, 128, 128, 128, 64]),
    (9.00719925474099e15, [233, 255, 255, 255, 255, 255, 255, 255, 192]),
    (9.007199254740991e15, [106]),
    (-1.0, [130, 128, 128, 128, 128, 128, 128, 128, 48]),
    (-0.5, [254, 128, 128, 128, 128, 128, 128, 128, 63]),
]

SIGNED_VAR_LONGS = [
    (0, [0]),
    (1, [2]),
    (63, [126]),
    (64, [128, 1]),
    (65, [130, 1]),
    (127, [254, 1]),
    (128, [128, 2]),
    (8191, [254, 127]),
    (8192, [128, 128, 1]),
    (8193, [130, 128, 1]),
    (4611686018427387902, [252, 255, 255, 255, 255, 255, 255, 255, 127]),
    (4611686018427387903, [254, 255, 255, 255, 255, 255, 255, 255, 127]),
    (4611686018427387904, [128, 128, 128, 128, 128, 128, 128, 128, 128]),
    (9223372036854775806, [252, 255, 255, 255, 255, 255, 255, 255, 255]),
    (9223372036854775807, [254, 255, 255, 255, 255, 255, 255, 255, 255]),
    (-1, [1]),
    (-63, [125]),
    (-64, [127]),
    (-65, [129, 1]),
    (-127, [253, 1]),
    (-128, [255, 1]),
    (-8191, [253, 127]),
    (-8192, [255, 127]),
    (-8193, [129, 128, 1]),
    (-4611686018427387903, [253, 255, 255, 255, 255, 255, 255, 255, 127]),
    (-4611686018427387904, [255, 255, 255, 255, 255, 255, 255, 255, 127]),
    (-4611686018427387905, [129, 128, 128, 128, 128, 128, 128, 128, 128]),
    (-9223372036854775807, [253, 255, 255, 255, 255, 255, 255, 255, 255]),
    (-9223372036854775808, [255, 255, 255, 255, 255, 255, 255, 255, 255]),
]

UNSIGNED_VAR_LONGS = [
    (0, [0]),
    (1, [1]),
    (127, [127]),
    (128, [128, 1]),
    (129, [129, 1]),
    (255, [255, 1]),
    (256, [128, 2]),
    (16383, [255, 127]),
    (16384, [128, 128, 1]),
    (16385, [129, 128, 1]),
    (-2, [254, 255, 255, 255, 255, 255, 255, 255, 255]),
    (-1, [255, 255, 255, 255, 255, 255, 255, 255, 255]),
]


@pytest.mark.parametrize("value,expected", VAR_DOUBLES)
def test_encode_var_double(value, expected):
    buf = bytearray()
    serde.encode_var_double(buf, value)
    assert list(buf) == expected


@pytest.mark.parametrize("value,expected", VAR_DOUBLES)
def test_decode_var_double(value, expected):
    assert serde.decode_var_double(Input(bytes(expected))) == value


@pytest.mark.parametrize("value,expected", VAR_DOUBLES)
def test_var_double_encoded_length(value, expected):
    assert serde.var_double_encoded_length(value) == len(expected)


@pytest.mark.parametrize("value,expected", SIGNED_VAR_LONGS)
def test_encode_signed_var_long(value, expected):
    buf = bytearray()
    serde.encode_signed_var_long(buf, value)
    assert list(buf) == expected


@pytest.mark.parametrize("value,expected", SIGNED_VAR_LONGS)
def test_decode_signed_var_long(value, expected):
    assert serde.decode_signed_var_long(Input(bytes(expected))) == value


@pytest.mark.parametrize("value,expected", SIGNED_VAR_LONGS)
def test_signed_var_long_encoded_length(value, expected):
    assert serde.signed_var_long_encoded_length(value) == len(expected)


@pytest.mark.parametrize("value,expected", UNSIGNED_VAR_LONGS)
def test_decode_unsigned_var_long(value, expected):
    assert serde.decode_unsigned_var_long(Input(bytes(expected))) == value


@pytest.mark.parametrize("value,expected", UNSIGNED_VAR_LONGS)
def test_unsigned_var_long_encoded_length(value, expected):
    assert serde.unsigned_var_long_encoded_length(value) == len(expected)


@pytest.mark.parametrize("value,expected", UNSIGNED_VAR_LONGS)
def test_encode_unsigned_var_long_roundtrip(value, expected):
    buf = bytearray()
    serde.encode_unsigned_var_long(buf, value)
    assert serde.decode_unsigned_var_long(Input(bytes(buf))) == value


def test_i64_to_i32_exact():
    assert serde.i64_to_i32_exact(0) == 0
    assert serde.i64_to_i32_exact(2147483647) == 2147483647
    assert serde.i64_to_i32_exact(-2147483648) == -2147483648
    with pytest.raises(ValueError):
        serde.i64_to_i32_exact(2147483648)
    with pytest.raises(ValueError):
        serde.i64_to_i32_exact(-2147483649)


def test_build_double():
    assert serde.build_double(0, 1.0) == 1.0
