"""SSL-certificate graft tests (reference: crawl4ai/ssl_certificate.py).

The codec is pure Python, so most checks run without Spark; the operator
tests use the shared session fixture.  pyOpenSSL is absent in the sandbox,
so output *formats* are pinned against documented OpenSSL printers (see
crawl4ai_spark/x509.py docstring); what CAN be cross-executed is — the
reference's own ``_decode_cert_data`` and ``to_json`` run via the AST
loader against our flattened dicts.
"""

import base64
import hashlib
import json

import pytest
from pyspark.sql import functions as F

from reference_loader import load_method

from crawl4ai_spark.operators.ssl_cert import (
    _flatten_row,
    attach_synthetic_certs,
    extract_certificates,
    synth_cert_for_host,
)
from crawl4ai_spark.x509 import (
    build_cert_der,
    cert_to_der,
    cert_to_json,
    cert_to_pem,
    parse_cert_der,
)

HOSTS = [f"site{i}.example.com" for i in range(40)]


def _cert(host="a.test", **kw):
    defaults = dict(
        subject_cn=host,
        issuer_rdns=[("CN", "Issuer CA"), ("O", "Issuer Org"), ("C", "US")],
        serial=0xDEADBEEF,
        san_dns=[host],
        key_usage_bits=[0, 2],
    )
    defaults.update(kw)
    return build_cert_der(**defaults)


# ---------------------------------------------------------------------------
# Codec round-trip
# ---------------------------------------------------------------------------

def test_parse_basic_fields():
    info = parse_cert_der(_cert())
    assert info["subject"] == {"CN": "a.test"}
    assert info["issuer"] == {"CN": "Issuer CA", "O": "Issuer Org", "C": "US"}
    assert info["version"] == 2  # 0-based, X509v3
    assert info["serial_number"] == hex(0xDEADBEEF)
    assert info["signature_algorithm"] == "sha256WithRSAEncryption"


def test_fingerprint_reproduces_digest_hex_quirk():
    # ssl_certificate.py:96 — digest("sha256") yields ASCII "AB:CD:…" bytes;
    # .hex() re-encodes that ASCII.  Verify both layers explicitly.
    der = _cert()
    info = parse_cert_der(der)
    colon = ":".join(f"{b:02X}" for b in hashlib.sha256(der).digest())
    assert info["fingerprint"] == colon.encode("ascii").hex()
    assert bytes.fromhex(info["fingerprint"]).decode() == colon


def test_utctime_pivot_and_generalizedtime():
    # 1950-2049 are written as UTCTime and must widen back per RFC 5280.
    der = _cert(not_before="19990101120000", not_after="20491231235959")
    info = parse_cert_der(der)
    assert info["not_before"] == "19990101120000Z"[:-1] or info["not_before"] == "19990101120000"
    assert info["not_before"].startswith("1999")
    assert info["not_after"].startswith("2049")
    # >=2050 forces GeneralizedTime
    der2 = _cert(not_after="20500101000000")
    assert parse_cert_der(der2)["not_after"].startswith("2050")


def test_key_usage_and_san_and_bc_formats():
    der = _cert(
        san_dns=["a.test", "*.test"],
        san_ip=["10.1.2.3"],
        san_email=["admin@a.test"],
        key_usage_bits=[0, 2, 4],
        is_ca=True,
        pathlen=0,
    )
    exts = {e["name"]: e["value"] for e in parse_cert_der(der)["extensions"]}
    assert exts["keyUsage"] == "Digital Signature, Key Encipherment, Key Agreement"
    # GeneralNames keep DER order: rfc822 [1] < dNSName [2] < iPAddress [7]
    assert exts["subjectAltName"] == "email:admin@a.test, DNS:a.test, DNS:*.test, IP Address:10.1.2.3"
    assert exts["basicConstraints"] == "CA:TRUE, pathlen:0"


def test_leaf_basic_constraints_false():
    exts = {e["name"]: e["value"] for e in parse_cert_der(_cert())["extensions"]}
    assert exts["basicConstraints"] == "CA:FALSE"


def test_duplicate_attribute_last_wins():
    # dict(get_components()) keeps the last duplicate (plain dict over pairs).
    der = _cert(issuer_rdns=[("CN", "first"), ("CN", "second")])
    assert parse_cert_der(der)["issuer"] == {"CN": "second"}


def test_pem_der_roundtrip():
    der = _cert()
    info = parse_cert_der(der)
    assert cert_to_der(info) == der
    pem = cert_to_pem(info)
    assert pem.startswith("-----BEGIN CERTIFICATE-----\n")
    assert pem.endswith("\n-----END CERTIFICATE-----\n")
    body = pem.split("-----")[2].strip()
    lines = body.split("\n")
    assert all(len(l) <= 64 for l in lines)
    assert all(len(l) == 64 for l in lines[:-1])
    assert base64.b64decode(body) == der


def test_raw_cert_is_b64():
    der = _cert()
    info = parse_cert_der(der)
    assert base64.b64decode(info["raw_cert"]) == der


def test_malformed_der_raises():
    with pytest.raises(ValueError):
        parse_cert_der(b"\x30\x82\xff\xff_not_a_cert")


# ---------------------------------------------------------------------------
# Reference cross-execution (what's possible without pyOpenSSL)
# ---------------------------------------------------------------------------

def _load_decode_cert_data():
    class _Shim:
        pass

    fn = load_method(
        "ssl_certificate.py", "SSLCertificate", "_decode_cert_data", extra={"SSLCertificate": _Shim}
    )
    _Shim._decode_cert_data = staticmethod(fn)
    return fn


def test_decode_cert_data_xcheck():
    """Feed a pyOpenSSL-shaped bytes-laden dict through the reference's own
    _decode_cert_data; its output must equal our parser's already-decoded
    shape for the same logical certificate."""
    decode = _load_decode_cert_data()
    host = "site3.example.com"
    der = synth_cert_for_host(host)
    ours = parse_cert_der(der)
    # Re-encode our dict the way pyOpenSSL hands it over (bytes keys/values
    # for names, bytes times/sigalg, b64 bytes for raw_cert) …
    raw = {
        "subject": {k.encode(): v.encode() for k, v in ours["subject"].items()},
        "issuer": {k.encode(): v.encode() for k, v in ours["issuer"].items()},
        "version": ours["version"],
        "serial_number": ours["serial_number"],
        "not_before": ours["not_before"].encode(),
        "not_after": ours["not_after"].encode(),
        "fingerprint": ours["fingerprint"],
        "signature_algorithm": ours["signature_algorithm"].encode(),
        "raw_cert": base64.b64encode(der),
        "extensions": [{"name": e["name"].encode(), "value": e["value"]} for e in ours["extensions"]],
    }
    decoded = decode(raw)
    # … and the reference's decode must land exactly on our dict.
    assert decoded["subject"] == ours["subject"]
    assert decoded["issuer"] == ours["issuer"]
    assert decoded["not_before"] == ours["not_before"]
    assert decoded["not_after"] == ours["not_after"]
    assert decoded["signature_algorithm"] == ours["signature_algorithm"]
    assert decoded["raw_cert"] == ours["raw_cert"]
    assert decoded["extensions"] == ours["extensions"]


def test_to_json_xcheck():
    """The reference's to_json body is json.dumps(self, indent=2,
    ensure_ascii=False) (ssl_certificate.py:159-166) — run it on our dict."""
    to_json = load_method("ssl_certificate.py", "SSLCertificate", "to_json", extra={"json": json})
    info = parse_cert_der(synth_cert_for_host("site9.example.com"))
    assert to_json(dict(info)) == cert_to_json(info)
    assert json.loads(cert_to_json(info))["subject"]["CN"] == "site9.example.com"


# ---------------------------------------------------------------------------
# Synthetic generator determinism + variety
# ---------------------------------------------------------------------------

def test_synth_deterministic_and_varied():
    a1 = synth_cert_for_host("x.test")
    a2 = synth_cert_for_host("x.test")
    assert a1 == a2
    infos = [parse_cert_der(synth_cert_for_host(h)) for h in HOSTS]
    assert len({i["issuer"]["CN"] for i in infos}) >= 3
    assert len({i["signature_algorithm"] for i in infos}) >= 2
    sans = [dict((e["name"], e["value"]) for e in i["extensions"])["subjectAltName"] for i in infos]
    assert any("IP Address:" in s for s in sans)
    assert any("email:" in s for s in sans)
    for h, i in zip(HOSTS, infos):
        assert i["subject"]["CN"] == h
        assert f"DNS:{h}" in dict((e["name"], e["value"]) for e in i["extensions"])["subjectAltName"]


def test_validity_ordering():
    for h in HOSTS:
        i = parse_cert_der(synth_cert_for_host(h))
        assert i["not_before"] <= i["not_after"]


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

def test_extract_certificates_operator(spark):
    hosts = spark.createDataFrame([(h,) for h in HOSTS[:12]], ["host"])
    out = extract_certificates(attach_synthetic_certs(hosts)).collect()
    assert len(out) == 12
    by_host = {r["host"]: r for r in out}
    for h in HOSTS[:12]:
        r = by_host[h]
        exp = _flatten_row(h, synth_cert_for_host(h))
        assert r["error"] is None
        assert r["subject_cn"] == h
        assert r["fingerprint"] == exp["fingerprint"]
        assert r["pem_md5"] == exp["pem_md5"]
        assert r["san"] == exp["san"]


def test_extract_certificates_row_error_isolation(spark):
    rows = [("good.test", synth_cert_for_host("good.test")), ("bad.test", b"\x00\x01junk")]
    df = spark.createDataFrame(rows, ["host", "cert_der"])
    out = {r["host"]: r for r in extract_certificates(df).collect()}
    assert out["good.test"]["error"] is None
    assert out["bad.test"]["error"] is not None
    assert out["bad.test"]["subject_cn"] is None


def test_operator_plan_is_shuffle_free(spark):
    hosts = spark.createDataFrame([(h,) for h in HOSTS], ["host"])
    plan = extract_certificates(attach_synthetic_certs(hosts))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # stateless map plane, embarrassingly parallel
