"""PDF writer/parser (crawl4ai_spark/pdf.py) + the pdfproc operator.

The clean_pdf_text transcription is cross-checked by executing the
REFERENCE's own function (processors/pdf/utils.py:213) via AST
extraction — both must emit identical markdown over a corpus of
article-shaped texts.
"""

import html as _html
from datetime import datetime

import numpy as np
import pytest

from crawl4ai_spark import pdf
from crawl4ai_spark.operators import pdfproc
from tests.reference_loader import load_defs


def article_pages():
    return [
        {"lines": [(72, 720, 18, "A Study of Crawl Frontiers"),
                   (72, 700, 10, "Jane Doe, John Smith"),
                   (72, 680, 10, "Abstract"),
                   (72, 668, 10, "We crawl (the web) deeply."),
                   (72, 650, 10, "1 Introduction"),
                   (72, 638, 10, "Crawling is use-"),
                   (72, 626, 10, "ful and fun today.")],
         "links": ["https://example.com/a", "https://example.com/b?x=1&y=2"]},
        {"lines": [(72, 720, 12, "2.1 Background"),
                   (72, 700, 10, "Deep crawling predates LLMs.")],
         "links": []},
    ]


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip(compress):
    data = pdf.write_pdf(article_pages(), title="Crawl Study", author="J. Doe",
                         created=datetime(2023, 5, 17, 10, 30, 0), compress=compress)
    out = pdf.parse_pdf(data)
    m = out["metadata"]
    assert (m["title"], m["author"]) == ("Crawl Study", "J. Doe")
    assert m["created"] == datetime(2023, 5, 17, 10, 30, 0)
    assert m["pages"] == 2
    p1, p2 = out["pages"]
    assert p1["raw_text"].splitlines()[0] == "A Study of Crawl Frontiers"
    assert "use-" in p1["raw_text"] and "ful and fun today." in p1["raw_text"]
    assert p1["links"] == ["https://example.com/a", "https://example.com/b?x=1&y=2"]
    assert p2["links"] == []
    assert p2["raw_text"] == "2.1 Background\nDeep crawling predates LLMs."
    # layout mirrors the reference's visitor capture: text + tm translation
    assert p1["layout"][0] == {"type": "text", "text": "A Study of Crawl Frontiers",
                               "x": 72.0, "y": 720.0}
    assert p1["layout"][1]["y"] == 700.0


def test_string_escapes_and_hex():
    pages = [{"lines": [(10, 700, 10, "Parens () and \\ backslash and (nested (deep))")],
              "links": []}]
    out = pdf.parse_pdf(pdf.write_pdf(pages))
    assert out["pages"][0]["raw_text"] == "Parens () and \\ backslash and (nested (deep))"
    # hex strings + TJ arrays via a hand-built content stream
    content = b"BT /F1 10 Tf 1 0 0 1 5 700 Tm [(ab) -120 <6364>] TJ ET"
    layout = pdf._extract_text(content)
    assert layout[0]["text"] == "abcd"
    # octal escape
    layout = pdf._extract_text(b"BT (\\101\\102) Tj ET")
    assert layout[0]["text"] == "AB"


def test_td_tstar_quote_operators():
    content = (b"BT /F1 10 Tf 14 TL 1 0 0 1 100 700 Tm (l1) Tj "
               b"0 -20 Td (l2) Tj T* (l3) Tj (l4) ' ET")
    layout = pdf._extract_text(content)
    assert [e["text"] for e in layout] == ["l1", "l2", "l3", "l4"]
    assert [e["y"] for e in layout] == [700.0, 680.0, 666.0, 652.0]


def test_malformed_rejected():
    with pytest.raises(ValueError, match="not a PDF"):
        pdf.parse_pdf(b"HELLO")
    with pytest.raises(ValueError):
        pdf.parse_pdf(b"%PDF-1.4\nnothing here")
    # unsupported filter fails loudly
    data = pdf.write_pdf(article_pages(), compress=True)
    bad = data.replace(b"/FlateDecode", b"/LZWDecode\x20\x20")
    with pytest.raises(ValueError, match="filter"):
        pdf.parse_pdf(bad)


def test_parse_pdf_date():
    assert pdf.parse_pdf_date("D:20230517103000") == datetime(2023, 5, 17, 10, 30, 0)
    assert pdf.parse_pdf_date("D:2023") == datetime(2023, 1, 1)
    assert pdf.parse_pdf_date("") is None
    assert pdf.parse_pdf_date("D:garbage") is None


REF_TEXTS = [
    "A Study of Crawl Frontiers\nJane Doe, John Smith\n\nAbstract\nWe crawl deeply.\n",
    "Short Title Here Now\n\n1 Introduction\nCrawling is use-\nful today.\n"
    "2.1 Background\nDeep crawls predate LLMs (Smith et al. 2020).\n",
    "†University of Somewhere\n{jane,john}@example.com\n\"A quote line\nplain text after.\n",
    "No headline because this opening line is far too long to be considered one\n"
    "3 Methods\nWe do things , oddly spaced .\n",
    "",
]


def test_clean_pdf_text_matches_reference():
    ref = load_defs("processors/pdf/utils.py", ["clean_pdf_text"],
                    extra={"html": _html})["clean_pdf_text"]
    for page_number in (1, 2):
        for text in REF_TEXTS:
            assert pdf.clean_pdf_text(page_number, text) == ref(page_number, text), (
                page_number, text)


def test_process_pdfs_distributed(spark):
    rows = [
        ("d0", bytearray(pdf.write_pdf(article_pages(), title="T0", author="A0",
                                       created=datetime(2021, 2, 3, 4, 5, 6)))),
        ("bad", bytearray(b"%PDF-1.4 broken")),
    ]
    df = spark.createDataFrame(rows, "doc_id string, bytes binary")
    out = pdfproc.process_pdfs(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    good = sorted(by_doc["d0"], key=lambda r: r["page_number"])
    assert [r["page_number"] for r in good] == [1, 2]
    assert good[0]["title"] == "T0" and good[0]["n_pages"] == 2
    assert good[0]["created_iso"] == "2021-02-03T04:05:06"
    assert good[0]["links"] == ["https://example.com/a", "https://example.com/b?x=1&y=2"]
    assert good[0]["markdown"] == pdf.clean_pdf_text(1, good[0]["raw_text"])
    assert len(by_doc["bad"]) == 1 and by_doc["bad"][0]["error"]
    assert by_doc["bad"][0]["page_number"] is None


# ---------------------------------------------------------------------------
# image X-Objects (reference processor.py:234-399 ladder)
# ---------------------------------------------------------------------------


def _img_pages(with_dct=True):
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (7, 9, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    images = [
        {"kind": "flate", "pixels": rgb},
        {"kind": "flate", "pixels": gray, "predictor": True},
    ]
    if with_dct:
        from crawl4ai_spark.jpeg import encode_jpeg

        images.append({"kind": "dct", "data": encode_jpeg(np.ascontiguousarray(rgb), quality=92),
                       "w": 9, "h": 7})
    pages = article_pages()
    pages[0]["images"] = images
    return pages, rgb, gray


@pytest.mark.parametrize("compress", [True, False])
def test_image_xobject_roundtrip(compress):
    from crawl4ai_spark.png import decode_png

    pages, rgb, gray = _img_pages()
    out = pdf.parse_pdf(pdf.write_pdf(pages, compress=compress))
    imgs = out["pages"][0]["images"]
    assert [i["format"] for i in imgs] == ["png", "png", "jpeg"]
    assert out["pages"][1]["images"] == []
    # Flate RGB: exact pixel parity through the ladder's PNG re-emit
    flate = imgs[0]
    assert (flate["width"], flate["height"]) == (9, 7)
    assert flate["color_space"] == "/DeviceRGB" and flate["bits_per_component"] == 8
    assert (decode_png(flate["data"]) == rgb).all()
    # Flate gray + Predictor 15: predictor inverted, gray expanded to RGB
    g = imgs[1]
    assert g["format"] == "png" and g["color_space"] == "/DeviceGray"
    assert (decode_png(g["data"]) == np.repeat(gray[:, :, None], 3, axis=2)).all()
    # DCTDecode: byte-identical JPEG pass-through
    assert imgs[2]["data"] == pages[0]["images"][2]["data"]


def test_png_predictor_encode_decode_inverse():
    rng = np.random.default_rng(3)
    for w, colors in [(9, 3), (6, 1), (1, 3)]:
        raw = rng.integers(0, 256, 5 * w * colors, dtype=np.uint8).tobytes()
        enc = pdf.png_predict_encode(raw, w, 8, colors)
        assert pdf.apply_png_predictor(enc, w, 8, colors) == raw


def test_apply_png_predictor_rejects_bad_scanlines():
    with pytest.raises(ValueError, match="scanline"):
        pdf.apply_png_predictor(b"\x00" * 7, 3, 8, 3)


def test_corrupt_image_never_kills_the_page():
    # truncate the Flate image stream in-place: the per-image try/except
    # must drop the image and keep the page text (reference parity)
    pages, _, _ = _img_pages(with_dct=False)
    data = bytearray(pdf.write_pdf(pages, compress=False))
    # corrupt every Flate image stream body (zlib magic 0x78)
    idx = data.find(b"/Subtype /Image")
    s = data.find(b"stream\n", idx) + 7
    data[s : s + 2] = b"\xff\xff"
    out = pdf.parse_pdf(bytes(data))
    assert out["pages"][0]["raw_text"]  # text survived
    assert len(out["pages"][0]["images"]) == 1  # corrupt one dropped


def test_extract_pdf_images_distributed(spark):
    import pandas as pd

    from crawl4ai_spark.png import phash64

    pages, rgb, gray = _img_pages()
    good = pdf.write_pdf(pages)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["good", "bad"], "bytes": [good, b"junk"]})
    )
    rows = pdfproc.extract_pdf_images(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r.asDict())
    imgs = sorted(by_doc["good"], key=lambda r: r["img_index"])
    assert [i["format"] for i in imgs] == ["png", "png", "jpeg"]
    assert imgs[0]["phash"] == phash64(rgb)
    assert all(i["error"] is None for i in imgs)
    assert by_doc["bad"][0]["error"] and by_doc["bad"][0]["page_number"] is None
