"""Pure-Python X.509/DER certificate codec for the SSL-certificate graft.

Reference surface: ``crawl4ai/ssl_certificate.py`` — ``SSLCertificate.from_url``
(:61-134) fetches the peer certificate over a socket and flattens it with
pyOpenSSL into a plain dict ``{subject, issuer, version, serial_number,
not_before, not_after, fingerprint, signature_algorithm, raw_cert,
extensions}``; ``to_json/to_pem/to_der`` (:159-198) export it.  Neither live
sockets nor pyOpenSSL exist in this sandbox, so the graft splits the surface
into (a) this codec — a minimal DER reader/writer that produces exactly the
reference's dict shape from certificate *bytes* — and (b) a Spark operator
(``operators/ssl_cert.py``) that runs it over a ``(host, cert_der)`` column.

Reference-parity notes (pyOpenSSL output formats, pinned here because the
library is absent and cannot be cross-executed):

* ``fingerprint`` — the reference computes ``x509.digest("sha256").hex()``
  (ssl_certificate.py:96).  pyOpenSSL's ``digest()`` returns the ASCII bytes
  of colon-separated uppercase hex (``b"AB:CD:..."``); calling ``.hex()`` on
  *that* hexlifies the ASCII string itself.  We reproduce the double-encoded
  value byte-for-byte: ``sha256(der) → "AB:CD:…" → .encode().hex()``.
* ``not_before``/``not_after`` — pyOpenSSL always reports ASN.1 times in
  GENERALIZEDTIME form ``YYYYMMDDhhmmssZ``; UTCTime payloads (two-digit year)
  are widened with the RFC 5280 pivot (00-49 → 20xx, 50-99 → 19xx).
* ``version`` — 0-based (X509v3 ⇒ 2), as ``x509.get_version()`` returns.
* ``serial_number`` — ``hex(serial)`` (ssl_certificate.py:95), lowercase
  ``0x…`` Python literal form.
* ``signature_algorithm`` — OpenSSL long name (``sha256WithRSAEncryption``,
  ``ecdsa-with-SHA256``).
* extensions — ``{"name": ext.get_short_name(), "value": str(ext)}``
  (ssl_certificate.py:104-110).  ``str(ext)`` is OpenSSL's X509V3 printer;
  the formats for the extension types we synthesize are pinned:
  ``basicConstraints`` → ``"CA:TRUE, pathlen:0"`` / ``"CA:FALSE"``,
  ``keyUsage`` → ``"Digital Signature, Key Encipherment"`` (comma-joined
  long bit names), ``subjectAltName`` → ``"DNS:a.example, IP Address:1.2.3.4,
  email:x@y"``, ``extendedKeyUsage`` → ``"TLS Web Server Authentication,
  TLS Web Client Authentication"``, ``subjectKeyIdentifier`` → colon hex.
* ``subject``/``issuer`` — ``dict(x509.get_subject().get_components())``:
  short-name keys (``CN``, ``O``, …); a duplicated attribute keeps the LAST
  occurrence (plain ``dict()`` over pairs).

The DER *writer* exists to synthesize deterministic certificates for tests
and fixtures (signature/key bytes are an SHA-256 stream, not real crypto —
the parse surface is what is under test, as the reference never validates
signatures either; it parses whatever the peer sent).
"""
from __future__ import annotations

import base64
import hashlib
import json
from typing import Any, Dict, List, Optional, Tuple

# ---------------------------------------------------------------------------
# ASN.1 DER primitives
# ---------------------------------------------------------------------------

_TAG_BOOL = 0x01
_TAG_INT = 0x02
_TAG_BITSTR = 0x03
_TAG_OCTSTR = 0x04
_TAG_NULL = 0x05
_TAG_OID = 0x06
_TAG_UTF8 = 0x0C
_TAG_PRINTABLE = 0x13
_TAG_IA5 = 0x16
_TAG_UTCTIME = 0x17
_TAG_GENTIME = 0x18
_TAG_SEQ = 0x30
_TAG_SET = 0x31


def _enc_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def _tlv(tag: int, body: bytes) -> bytes:
    return bytes([tag]) + _enc_len(len(body)) + body


def _enc_int(v: int) -> bytes:
    if v == 0:
        return _tlv(_TAG_INT, b"\x00")
    body = v.to_bytes((v.bit_length() + 8) // 8, "big")
    # strip redundant leading zero unless needed for sign
    if len(body) > 1 and body[0] == 0 and not (body[1] & 0x80):
        body = body[1:]
    return _tlv(_TAG_INT, body)


def _enc_oid(dotted: str) -> bytes:
    parts = [int(p) for p in dotted.split(".")]
    body = bytearray([40 * parts[0] + parts[1]])
    for arc in parts[2:]:
        chunk = bytearray([arc & 0x7F])
        arc >>= 7
        while arc:
            chunk.append(0x80 | (arc & 0x7F))
            arc >>= 7
        body.extend(reversed(chunk))
    return _tlv(_TAG_OID, bytes(body))


def _dec_oid(body: bytes) -> str:
    first = body[0]
    parts = [first // 40, first % 40] if first < 80 else [2, first - 80]
    acc = 0
    for b in body[1:]:
        acc = (acc << 7) | (b & 0x7F)
        if not (b & 0x80):
            parts.append(acc)
            acc = 0
    return ".".join(str(p) for p in parts)


class DerReader:
    """Forward-only DER TLV reader (definite lengths only, as DER requires)."""

    def __init__(self, data: bytes, pos: int = 0, end: Optional[int] = None):
        self.data = data
        self.pos = pos
        self.end = len(data) if end is None else end

    def eof(self) -> bool:
        return self.pos >= self.end

    def read_tlv(self) -> Tuple[int, bytes, bytes]:
        """Return (tag, body, raw_including_header)."""
        if self.pos >= self.end:
            raise ValueError("DER: truncated (read past end)")
        start = self.pos
        tag = self.data[self.pos]
        self.pos += 1
        if tag & 0x1F == 0x1F:
            raise ValueError("DER: multi-byte tags unsupported")
        ln = self.data[self.pos]
        self.pos += 1
        if ln & 0x80:
            n = ln & 0x7F
            if n == 0 or n > 8:
                raise ValueError("DER: indefinite/oversized length")
            ln = int.from_bytes(self.data[self.pos:self.pos + n], "big")
            self.pos += n
        if self.pos + ln > self.end:
            raise ValueError("DER: length overruns container")
        body = self.data[self.pos:self.pos + ln]
        self.pos += ln
        return tag, body, self.data[start:self.pos]

    def peek_tag(self) -> int:
        if self.pos >= self.end:
            raise ValueError("DER: truncated (peek past end)")
        return self.data[self.pos]


# ---------------------------------------------------------------------------
# OID tables (X.520 attribute types, algorithms, extensions)
# ---------------------------------------------------------------------------

_ATTR_SHORT = {
    "2.5.4.3": "CN",
    "2.5.4.6": "C",
    "2.5.4.7": "L",
    "2.5.4.8": "ST",
    "2.5.4.10": "O",
    "2.5.4.11": "OU",
    "1.2.840.113549.1.9.1": "emailAddress",
}
_ATTR_OID = {v: k for k, v in _ATTR_SHORT.items()}

_SIG_LONG = {
    "1.2.840.113549.1.1.11": "sha256WithRSAEncryption",
    "1.2.840.113549.1.1.13": "sha512WithRSAEncryption",
    "1.2.840.10045.4.3.2": "ecdsa-with-SHA256",
}
_SIG_OID = {v: k for k, v in _SIG_LONG.items()}

_EXT_SHORT = {
    "2.5.29.19": "basicConstraints",
    "2.5.29.15": "keyUsage",
    "2.5.29.17": "subjectAltName",
    "2.5.29.37": "extendedKeyUsage",
    "2.5.29.14": "subjectKeyIdentifier",
}
_EXT_OID = {v: k for k, v in _EXT_SHORT.items()}

# RFC 5280 KeyUsage named bits, OpenSSL long names in bit order 0..8.
_KEY_USAGE_BITS = [
    "Digital Signature", "Non Repudiation", "Key Encipherment",
    "Data Encipherment", "Key Agreement", "Certificate Sign", "CRL Sign",
    "Encipher Only", "Decipher Only",
]

_EKU_LONG = {
    "1.3.6.1.5.5.7.3.1": "TLS Web Server Authentication",
    "1.3.6.1.5.5.7.3.2": "TLS Web Client Authentication",
}
_EKU_OID = {v: k for k, v in _EKU_LONG.items()}


# ---------------------------------------------------------------------------
# Writer: deterministic synthetic certificates
# ---------------------------------------------------------------------------

def _enc_name(rdns: List[Tuple[str, str]]) -> bytes:
    """Name = SEQUENCE OF RDN; one attribute per RDN (the common layout)."""
    out = b""
    for short, value in rdns:
        atv = _enc_oid(_ATTR_OID[short]) + _tlv(_TAG_UTF8, value.encode())
        out += _tlv(_TAG_SET, _tlv(_TAG_SEQ, atv))
    return _tlv(_TAG_SEQ, out)


def _enc_time(s: str) -> bytes:
    """Encode 'YYYYMMDDhhmmssZ'; years 1950-2049 as UTCTime per RFC 5280."""
    year = int(s[:4])
    if 1950 <= year < 2050:
        return _tlv(_TAG_UTCTIME, s[2:].encode())
    return _tlv(_TAG_GENTIME, s.encode())


def _stream_bytes(seed: str, n: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n:
        out.extend(hashlib.sha256(f"{seed}|{i}".encode()).digest())
        i += 1
    return bytes(out[:n])


def _enc_extension(oid: str, critical: bool, value_der: bytes) -> bytes:
    body = _enc_oid(oid)
    if critical:
        body += _tlv(_TAG_BOOL, b"\xff")
    body += _tlv(_TAG_OCTSTR, value_der)
    return _tlv(_TAG_SEQ, body)


def _enc_key_usage(bits: List[int]) -> bytes:
    """DER named-bit BIT STRING: trailing zero bits trimmed."""
    if not bits:
        return _tlv(_TAG_BITSTR, b"\x00")
    hi = max(bits)
    nbytes = hi // 8 + 1
    arr = bytearray(nbytes)
    for b in bits:
        arr[b // 8] |= 0x80 >> (b % 8)
    unused = 7 - (hi % 8)
    return _tlv(_TAG_BITSTR, bytes([unused]) + bytes(arr))


def build_cert_der(
    subject_cn: str,
    issuer_rdns: List[Tuple[str, str]],
    subject_extra: Optional[List[Tuple[str, str]]] = None,
    serial: int = 1,
    not_before: str = "20250101000000",
    not_after: str = "20270101000000",
    sig_alg: str = "sha256WithRSAEncryption",
    san_dns: Optional[List[str]] = None,
    san_ip: Optional[List[str]] = None,
    san_email: Optional[List[str]] = None,
    key_usage_bits: Optional[List[int]] = None,
    is_ca: bool = False,
    pathlen: Optional[int] = None,
    eku: Optional[List[str]] = None,
    seed: str = "cert",
) -> bytes:
    """Emit a structurally-valid X.509 v3 DER certificate.

    Signature and public-key bytes are a deterministic SHA-256 stream — the
    reference never verifies signatures (it flattens whatever the peer sent,
    ssl_certificate.py:86-110), so neither do we.
    """
    sig_oid = _SIG_OID[sig_alg]
    if sig_alg.startswith("ecdsa"):
        alg_id = _tlv(_TAG_SEQ, _enc_oid(sig_oid))  # ECDSA: params absent
    else:
        alg_id = _tlv(_TAG_SEQ, _enc_oid(sig_oid) + _tlv(_TAG_NULL, b""))

    subject_rdns = [("CN", subject_cn)] + list(subject_extra or [])

    # SubjectPublicKeyInfo: rsaEncryption + opaque key bits.
    spki_alg = _tlv(_TAG_SEQ, _enc_oid("1.2.840.113549.1.1.1") + _tlv(_TAG_NULL, b""))
    key_bits = _stream_bytes(f"{seed}|key|{subject_cn}", 70)
    spki = _tlv(_TAG_SEQ, spki_alg + _tlv(_TAG_BITSTR, b"\x00" + key_bits))

    exts = b""
    bc = _tlv(_TAG_BOOL, b"\xff") if is_ca else b""
    if is_ca and pathlen is not None:
        bc += _enc_int(pathlen)
    exts += _enc_extension(_EXT_OID["basicConstraints"], True, _tlv(_TAG_SEQ, bc))
    if key_usage_bits is not None:
        exts += _enc_extension(_EXT_OID["keyUsage"], True, _enc_key_usage(key_usage_bits))
    gen_names = b""
    for e in san_email or []:
        gen_names += _tlv(0x81, e.encode())          # [1] rfc822Name
    for d in san_dns or []:
        gen_names += _tlv(0x82, d.encode())          # [2] dNSName
    for ip in san_ip or []:
        gen_names += _tlv(0x87, bytes(int(p) for p in ip.split(".")))  # [7] iPAddress
    if gen_names:
        exts += _enc_extension(_EXT_OID["subjectAltName"], False, _tlv(_TAG_SEQ, gen_names))
    if eku:
        eku_body = b"".join(_enc_oid(_EKU_OID[e]) for e in eku)
        exts += _enc_extension(_EXT_OID["extendedKeyUsage"], False, _tlv(_TAG_SEQ, eku_body))
    ski = hashlib.sha256(f"{seed}|ski|{subject_cn}".encode()).digest()[:20]
    exts += _enc_extension(_EXT_OID["subjectKeyIdentifier"], False, _tlv(_TAG_OCTSTR, ski))

    tbs = (
        _tlv(0xA0, _enc_int(2))                      # [0] version: v3
        + _enc_int(serial)
        + alg_id
        + _enc_name(issuer_rdns)
        + _tlv(_TAG_SEQ, _enc_time(not_before) + _enc_time(not_after))
        + _enc_name(subject_rdns)
        + spki
        + _tlv(0xA3, _tlv(_TAG_SEQ, exts))           # [3] extensions
    )
    tbs = _tlv(_TAG_SEQ, tbs)
    sig_bits = _stream_bytes(f"{seed}|sig|{subject_cn}|{serial}", 64)
    return _tlv(_TAG_SEQ, tbs + alg_id + _tlv(_TAG_BITSTR, b"\x00" + sig_bits))


# ---------------------------------------------------------------------------
# Parser → the reference's cert_info dict shape
# ---------------------------------------------------------------------------

def _parse_name(body: bytes) -> Dict[str, str]:
    """dict(get_components()) — LAST duplicate wins (plain dict over pairs)."""
    out: Dict[str, str] = {}
    rd = DerReader(body)
    while not rd.eof():
        _, rdn_body, _ = rd.read_tlv()               # SET
        sd = DerReader(rdn_body)
        while not sd.eof():
            _, atv, _ = sd.read_tlv()                # SEQUENCE
            ad = DerReader(atv)
            _, oid_body, _ = ad.read_tlv()
            _, val_body, _ = ad.read_tlv()
            oid = _dec_oid(oid_body)
            key = _ATTR_SHORT.get(oid, oid)
            out[key] = val_body.decode("utf-8", "replace")
    return out


def _widen_time(tag: int, body: bytes) -> str:
    """pyOpenSSL reports GENERALIZEDTIME 'YYYYMMDDhhmmssZ' for both forms."""
    s = body.decode("ascii")
    if tag == _TAG_UTCTIME:
        century = "20" if int(s[:2]) < 50 else "19"  # RFC 5280 4.1.2.5.1 pivot
        return century + s
    return s


def _fmt_colon_hex(b: bytes) -> str:
    return ":".join(f"{x:02X}" for x in b)


def _parse_key_usage(der: bytes) -> str:
    _, body, _ = DerReader(der).read_tlv()
    unused = body[0]
    bits = []
    nbits = (len(body) - 1) * 8 - unused
    for i in range(min(nbits, 9)):
        if body[1 + i // 8] & (0x80 >> (i % 8)):
            bits.append(_KEY_USAGE_BITS[i])
    return ", ".join(bits)


def _parse_san(der: bytes) -> str:
    _, body, _ = DerReader(der).read_tlv()
    rd = DerReader(body)
    parts = []
    while not rd.eof():
        tag, val, _ = rd.read_tlv()
        kind = tag & 0x1F
        if kind == 1:
            parts.append("email:" + val.decode("ascii", "replace"))
        elif kind == 2:
            parts.append("DNS:" + val.decode("ascii", "replace"))
        elif kind == 7:
            parts.append("IP Address:" + ".".join(str(x) for x in val))
        else:  # pragma: no cover - not synthesized
            parts.append(f"othername:<unsupported>")
    return ", ".join(parts)


def _parse_basic_constraints(der: bytes) -> str:
    _, body, _ = DerReader(der).read_tlv()
    rd = DerReader(body)
    ca = False
    pathlen = None
    while not rd.eof():
        tag, val, _ = rd.read_tlv()
        if tag == _TAG_BOOL:
            ca = val != b"\x00"
        elif tag == _TAG_INT:
            pathlen = int.from_bytes(val, "big")
    s = "CA:TRUE" if ca else "CA:FALSE"
    if pathlen is not None:
        s += f", pathlen:{pathlen}"
    return s


def _parse_eku(der: bytes) -> str:
    _, body, _ = DerReader(der).read_tlv()
    rd = DerReader(body)
    parts = []
    while not rd.eof():
        _, oid_body, _ = rd.read_tlv()
        oid = _dec_oid(oid_body)
        parts.append(_EKU_LONG.get(oid, oid))
    return ", ".join(parts)


def _ext_value_str(short: str, value_der: bytes) -> str:
    if short == "keyUsage":
        return _parse_key_usage(value_der)
    if short == "subjectAltName":
        return _parse_san(value_der)
    if short == "basicConstraints":
        return _parse_basic_constraints(value_der)
    if short == "extendedKeyUsage":
        return _parse_eku(value_der)
    if short == "subjectKeyIdentifier":
        _, body, _ = DerReader(value_der).read_tlv()
        return _fmt_colon_hex(body)
    return value_der.hex()  # unknown: raw hex (OpenSSL would print DER dump)


def parse_cert_der(der: bytes) -> Dict[str, Any]:
    """Flatten certificate DER into the reference's cert_info dict
    (ssl_certificate.py:86-110), all values already str-decoded the way
    ``_decode_cert_data`` (:41-60) would leave them."""
    rd = DerReader(der)
    _, cert_body, _ = rd.read_tlv()                  # Certificate
    cd = DerReader(cert_body)
    _, tbs_body, _ = cd.read_tlv()                   # TBSCertificate
    _, sig_alg_body, _ = cd.read_tlv()               # signatureAlgorithm

    td = DerReader(tbs_body)
    version = 0
    if td.peek_tag() == 0xA0:
        _, vbody, _ = td.read_tlv()
        _, vint, _ = DerReader(vbody).read_tlv()
        version = int.from_bytes(vint, "big")
    _, serial_body, _ = td.read_tlv()
    serial = int.from_bytes(serial_body, "big", signed=True)
    td.read_tlv()                                    # tbs signature alg (dup)
    _, issuer_body, _ = td.read_tlv()
    _, validity_body, _ = td.read_tlv()
    vd = DerReader(validity_body)
    nb_tag, nb_body, _ = vd.read_tlv()
    na_tag, na_body, _ = vd.read_tlv()
    _, subject_body, _ = td.read_tlv()
    td.read_tlv()                                    # SPKI (opaque here)

    extensions: List[Dict[str, str]] = []
    while not td.eof():
        tag, opt_body, _ = td.read_tlv()
        if tag != 0xA3:
            continue                                 # [1]/[2] issuer/subject UIDs
        _, ext_seq, _ = DerReader(opt_body).read_tlv()
        ed = DerReader(ext_seq)
        while not ed.eof():
            _, ext_body, _ = ed.read_tlv()
            xd = DerReader(ext_body)
            _, oid_body, _ = xd.read_tlv()
            t = xd.peek_tag()
            if t == _TAG_BOOL:
                xd.read_tlv()                        # critical flag
            _, value_der, _ = xd.read_tlv()
            oid = _dec_oid(oid_body)
            short = _EXT_SHORT.get(oid, oid)
            extensions.append({"name": short, "value": _ext_value_str(short, value_der)})

    ad = DerReader(sig_alg_body)
    _, sig_oid_body, _ = ad.read_tlv()
    sig_oid = _dec_oid(sig_oid_body)

    # Reference quirk (ssl_certificate.py:96): digest() returns ASCII
    # "AB:CD:…" bytes and .hex() re-encodes that ASCII — reproduced exactly.
    colon = _fmt_colon_hex(hashlib.sha256(der).digest())
    fingerprint = colon.encode("ascii").hex()

    return {
        "subject": _parse_name(subject_body),
        "issuer": _parse_name(issuer_body),
        "version": version,
        "serial_number": hex(serial),
        "not_before": _widen_time(nb_tag, nb_body),
        "not_after": _widen_time(na_tag, na_body),
        "fingerprint": fingerprint,
        "signature_algorithm": _SIG_LONG.get(sig_oid, sig_oid),
        "raw_cert": base64.b64encode(der).decode("ascii"),
        "extensions": extensions,
    }


# ---------------------------------------------------------------------------
# Exports (ssl_certificate.py:159-198)
# ---------------------------------------------------------------------------

def cert_to_json(cert_info: Dict[str, Any]) -> str:
    """``to_json`` parity: json.dumps(self, indent=2, ensure_ascii=False)."""
    return json.dumps(cert_info, indent=2, ensure_ascii=False)


def cert_to_pem(cert_info: Dict[str, Any]) -> str:
    """``to_pem`` parity: OpenSSL PEM writer = base64 in 64-char lines."""
    der = base64.b64decode(cert_info.get("raw_cert", ""))
    b64 = base64.b64encode(der).decode("ascii")
    lines = [b64[i:i + 64] for i in range(0, len(b64), 64)]
    return "-----BEGIN CERTIFICATE-----\n" + "\n".join(lines) + "\n-----END CERTIFICATE-----\n"


def cert_to_der(cert_info: Dict[str, Any]) -> bytes:
    """``to_der`` parity: base64-decode of the stored raw_cert."""
    return base64.b64decode(cert_info.get("raw_cert", ""))
