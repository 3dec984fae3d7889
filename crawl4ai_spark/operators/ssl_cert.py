"""SSL-certificate extraction over a ``(host, cert_der)`` table.

Reference surface: ``crawl4ai/ssl_certificate.py`` — ``SSLCertificate``
fetches the peer certificate per URL when ``fetch_ssl_certificate`` is set
(``async_crawler_strategy.py`` attaches it to the CrawlResult) and flattens
it into a dict via pyOpenSSL (:61-134), with ``to_json/to_pem/to_der``
exports (:159-198).  The socket fetch is I/O out of scope (same ruling as
the Playwright fetch); the *parse/flatten/export* plane is grafted for real:
a pure-Python DER codec (``crawl4ai_spark/x509.py``) runs Arrow-batched
inside one stateless ``mapInPandas`` — embarrassingly parallel, no shuffle,
the same scale shape as the image decode plane.

Certificates are synthesized deterministically per host (structurally valid
X.509 v3 DER; signature bytes are a hash stream — the reference never
verifies signatures either, it parses whatever the peer sent).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..x509 import build_cert_der, cert_to_pem, parse_cert_der

# Four synthetic issuing CAs, picked per host hash.
_ISSUERS = [
    [("CN", "Synth Root CA R1"), ("O", "Synth Trust Services"), ("C", "US")],
    [("CN", "Synth ECC CA E2"), ("O", "Synth Trust Services"), ("C", "US")],
    [("CN", "Example Org Issuing CA"), ("O", "Example Org"), ("C", "DE")],
    [("CN", "Test Authority X3"), ("O", "Test Authority"), ("C", "SG")],
]
_SIG_ALGS = ["sha256WithRSAEncryption", "ecdsa-with-SHA256", "sha512WithRSAEncryption"]
# Leaf-typical keyUsage bit sets (bit numbers per RFC 5280).
_KU_SETS = [[0, 2], [0], [0, 2, 4]]


def synth_cert_for_host(host: str) -> bytes:
    """Deterministic per-host certificate DER (pure function: the Spark UDF
    and the DuckDB fixture oracle both call this)."""
    h = hashlib.md5(host.encode()).digest()
    issuer = _ISSUERS[h[0] % len(_ISSUERS)]
    sig_alg = _SIG_ALGS[h[1] % len(_SIG_ALGS)]
    serial = int.from_bytes(h[2:8], "big")
    # Validity: deterministic day offsets around a fixed epoch (no wall clock).
    nb_day = h[8] % 28 + 1
    months = h[9] % 24
    not_before = f"2025{(h[10] % 12) + 1:02d}{nb_day:02d}000000"
    not_after_year = 2025 + (((h[10] % 12) + months) // 12)
    not_after_mon = (((h[10] % 12) + months) % 12) + 1
    not_after = f"{not_after_year}{not_after_mon:02d}{nb_day:02d}235959"
    san_dns = [host, f"www.{host}"]
    san_ip = None
    san_email = None
    if h[11] % 5 == 0:
        parent = host.split(".", 1)[-1] if "." in host else host
        san_dns.append(f"*.{parent}")
        san_ip = [f"10.{h[12] % 256}.{h[13] % 256}.{h[14] % 254 + 1}"]
    if h[11] % 7 == 0:
        san_email = [f"admin@{host}"]
    return build_cert_der(
        subject_cn=host,
        issuer_rdns=issuer,
        subject_extra=[("O", f"Org {h[15] % 50}")] if h[15] % 3 == 0 else None,
        serial=serial,
        not_before=not_before,
        not_after=not_after,
        sig_alg=sig_alg,
        san_dns=san_dns,
        san_ip=san_ip,
        san_email=san_email,
        key_usage_bits=_KU_SETS[h[4] % len(_KU_SETS)],
        is_ca=False,
        eku=["TLS Web Server Authentication", "TLS Web Client Authentication"],
        seed="sslgraft",
    )


CERT_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("subject_cn", T.StringType()),
        T.StructField("subject_o", T.StringType()),
        T.StructField("issuer_cn", T.StringType()),
        T.StructField("issuer_o", T.StringType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("serial_hex", T.StringType()),
        T.StructField("not_before", T.StringType()),
        T.StructField("not_after", T.StringType()),
        T.StructField("fingerprint", T.StringType()),
        T.StructField("sig_alg", T.StringType()),
        T.StructField("san", T.StringType()),
        T.StructField("key_usage", T.StringType()),
        T.StructField("basic_constraints", T.StringType()),
        T.StructField("pem_md5", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def _flatten_row(host: str, der: bytes) -> dict:
    info = parse_cert_der(der)
    exts = {e["name"]: e["value"] for e in info["extensions"]}
    pem = cert_to_pem(info)
    return {
        "host": host,
        "subject_cn": info["subject"].get("CN"),
        "subject_o": info["subject"].get("O"),
        "issuer_cn": info["issuer"].get("CN"),
        "issuer_o": info["issuer"].get("O"),
        "version": info["version"],
        "serial_hex": info["serial_number"],
        "not_before": info["not_before"],
        "not_after": info["not_after"],
        "fingerprint": info["fingerprint"],
        "sig_alg": info["signature_algorithm"],
        "san": exts.get("subjectAltName"),
        "key_usage": exts.get("keyUsage"),
        "basic_constraints": exts.get("basicConstraints"),
        "pem_md5": hashlib.md5(pem.encode()).hexdigest(),
        "error": None,
    }


def extract_certificates(certs: DataFrame, der_col: str = "cert_der") -> DataFrame:
    """Parse every certificate into the reference's flattened columns.

    One stateless mapInPandas over ``(host, cert_der)`` — per-row error
    isolation (a malformed DER lands with ``error`` set, never crashing the
    job), matching the media operators' contract.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, der in zip(pdf["host"], pdf[der_col]):
                try:
                    rows.append(_flatten_row(host, bytes(der)))
                except Exception as e:
                    rows.append({"host": host, "version": None, "error": f"{type(e).__name__}: {e}"})
            yield pd.DataFrame(rows, columns=[f.name for f in CERT_RESULT_SCHEMA.fields])

    return certs.select("host", der_col).mapInPandas(gen, CERT_RESULT_SCHEMA)


def attach_synthetic_certs(hosts: DataFrame) -> DataFrame:
    """Materialize the deterministic per-host certificate payloads
    (the sandbox stand-in for the socket fetch)."""
    schema = T.StructType(
        [T.StructField("host", T.StringType()), T.StructField("cert_der", T.BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"host": pdf["host"], "cert_der": [synth_cert_for_host(x) for x in pdf["host"]]}
            )

    return hosts.select("host").mapInPandas(gen, schema)
