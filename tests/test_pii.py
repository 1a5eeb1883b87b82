"""PII redaction (operators/pii.py): per-kind counts, redaction order
(URL swallows IP/phone lookalikes inside it), boundary rules, exact
redacted output."""

import pytest
from pyspark.sql import functions as F

from sketches_rust_spark.operators.pii import PII_KINDS, redact_pii

# (text, expected redacted, n_url, n_email, n_ipv4, n_phone)
_CASES = [
    ("write to a.b-c_d@mail-srv.co.uk now",
     "write to [EMAIL] now", 0, 1, 0, 0),
    # URL is redacted FIRST: the ip- and phone-shaped substrings inside it
    # must not be double-counted
    ("visit https://x.io/a?b=1.2.3.4&c=555-123-4567 soon",
     "visit [URL] soon", 1, 0, 0, 0),
    # adjacent ip + phone: progressive redaction keeps them separate
    ("ip 10.0.255.123 555-123-0042 done",
     "ip [IP] [PHONE] done", 0, 0, 1, 1),
    ("call 555 123 4567 or 555-123-4567",
     "call [PHONE] or [PHONE]", 0, 0, 0, 2),
    ("no pii in this sentence", "no pii in this sentence", 0, 0, 0, 0),
    ("two mails a@b.com and c@d.org", "two mails [EMAIL] and [EMAIL]", 0, 2, 0, 0),
    # version-like token with a leading word char is NOT an IP (\b rule)
    ("release v1.2.3.4 shipped", "release v1.2.3.4 shipped", 0, 0, 0, 0),
    # bare dotted quad IS ip-shaped, by design
    ("quad 1.2.3.4 alone", "quad [IP] alone", 0, 0, 1, 0),
    # octets are range-checked: out-of-range quads are NOT IPs
    ("bogus 999.999.999.999 here", "bogus 999.999.999.999 here", 0, 0, 0, 0),
    ("edge 255.255.255.255 and 256.1.1.1",
     "edge [IP] and 256.1.1.1", 0, 0, 1, 0),
    # zero-padded octets are how real IPs render in padded logs
    ("padded 192.168.001.100 and 010.020.030.000",
     "padded [IP] and [IP]", 0, 0, 2, 0),
    ("", "", 0, 0, 0, 0),
]


@pytest.fixture(scope="module")
def redacted_rows(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(_CASES)], "i int, text string")
    out = redact_pii(df, "text")
    return {r["i"]: r for r in out.collect()}


@pytest.mark.parametrize("i", range(len(_CASES)))
def test_counts_and_redaction(redacted_rows, i):
    _, expected, n_url, n_email, n_ipv4, n_phone = _CASES[i]
    row = redacted_rows[i]
    assert row["redacted"] == expected
    assert (row["n_url"], row["n_email"], row["n_ipv4"], row["n_phone"]) == \
        (n_url, n_email, n_ipv4, n_phone)


def test_pure_projection_no_shuffle_no_python(spark):
    """Scale property: redact_pii is a map-only projection — no exchange,
    no Python eval node; it fuses into the downstream plan."""
    df = spark.createDataFrame([("a@b.com",)], "text string")
    plan = redact_pii(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_kind_order_fixed():
    assert [k for k, _, _ in PII_KINDS] == ["url", "email", "ipv4", "phone"]
