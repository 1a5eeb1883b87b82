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


def test_var_double_array_codec_matches_scalar():
    """Randomized cross-check: batch encode/decode is byte/bit identical to
    the scalar codec, including 9-byte tokens with MSB-set final bytes."""
    import numpy as np

    rng = np.random.default_rng(17)
    cases = np.concatenate([
        rng.integers(0, 1 << 40, size=2000).astype(np.float64),
        rng.lognormal(0, 30, size=2000),
        -rng.lognormal(0, 30, size=500),
        np.array([0.0, 1.0, -1.0, -0.5, 4.503599627370495e15,
                  4.503599627370496e15, 9.00719925474099e15]),
    ])
    batch = bytearray()
    serde.encode_var_double_array(batch, cases)
    scalar = bytearray()
    for v in cases:
        serde.encode_var_double(scalar, float(v))
    assert bytes(batch) == bytes(scalar)

    lens = serde.var_double_encoded_length_array(cases)
    for v, ln in zip(cases, lens):
        assert serde.var_double_encoded_length(float(v)) == ln

    # the decode contract: batch decode == scalar decode (the format itself
    # is lossy below ulp(1.0) — v is stored as bits(v+1.0), same as the
    # reference — so we compare decoders against each other, not against v)
    inp = Input(bytes(batch))
    scalar_decoded = np.array([serde.decode_var_double(inp) for _ in cases])
    fast = serde.try_decode_var_double_array(bytes(batch), 0, len(cases))
    if fast is not None:
        values, pos = fast
        assert pos == len(batch)
        np.testing.assert_array_equal(values, scalar_decoded)
    # integer counts (the real blob content) round-trip exactly
    ints = rng.integers(0, 1 << 50, size=3000).astype(np.float64)
    b2 = bytearray()
    serde.encode_var_double_array(b2, ints)
    fast2 = serde.try_decode_var_double_array(bytes(b2), 0, len(ints))
    if fast2 is None:
        inp2 = Input(bytes(b2))
        got2 = np.array([serde.decode_var_double(inp2) for _ in ints])
    else:
        got2, pos2 = fast2
        assert pos2 == len(b2)
    np.testing.assert_array_equal(got2, ints)


def test_var_double_array_decode_glue_fallback():
    """A 9-byte encoding whose 9th byte has the MSB set must be rejected by
    the fast parser (returns None), never mis-parsed."""
    import numpy as np

    # -1.0 encodes to 9 bytes ending in 48 (<128): find a value whose last
    # byte >= 128 by scanning
    found = None
    rng = np.random.default_rng(3)
    for v in rng.lognormal(0, 40, size=20000):
        buf = bytearray()
        serde.encode_var_double(buf, float(v))
        if len(buf) == 9 and buf[8] >= 128:
            found = float(v)
            break
    assert found is not None
    buf = bytearray()
    serde.encode_var_double(buf, found)
    serde.encode_var_double(buf, 1.0)
    fast = serde.try_decode_var_double_array(bytes(buf), 0, 2)
    assert fast is None  # glue detected -> caller falls back to scalar
    inp = Input(bytes(buf))
    assert serde.decode_var_double(inp) == found
    assert serde.decode_var_double(inp) == 1.0
