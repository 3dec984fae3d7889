"""PDF payload processing over (doc_id, bytes) tables.

The Spark surface for pdf.py — the graft of the reference's
NaivePDFProcessorStrategy (processors/pdf/processor.py:57): one
stateless mapInPandas pass fans each PDF out to per-page rows with raw
text, the reference's markdown cleanup, links, and document metadata —
exactly the shape the reference's PDFProcessResult carries
(processor.py:25-50), normalized into columns.  Linear in documents,
no shuffle; at corpus scale this is the same embarrassingly-parallel
plane as image decode.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PDF_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("page_number", T.IntegerType()),
        T.StructField("raw_text", T.StringType()),
        T.StructField("markdown", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("n_text_ops", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("created_iso", T.StringType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


PDF_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("page_number", T.IntegerType()),
        T.StructField("img_index", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("color_space", T.StringType()),
        T.StructField("bits_per_component", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("phash", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def extract_pdf_images(docs: DataFrame) -> DataFrame:
    """(doc_id, bytes) → one row per embedded image X-Object — the
    reference's ``PDFPage.images`` plane (processor.py:41,222-223,
    234-399) as a table: per page, per image, the decision-ladder format
    tag, dimensions, color space, bits, and the re-emitted payload bytes
    (PNG for Flate pixels, byte-identical JPEG for DCT).  ``phash`` is
    the perceptual hash of the DECODED payload (png.py/jpeg.py), so a
    row here pins the pixels end-to-end: PDF write → parse → ladder →
    payload decode.  Stateless mapInPandas, linear in documents, no
    shuffle — the same embarrassingly-parallel plane as image decode;
    unparseable docs land as a single error row, undecodable payloads
    keep the row with phash NULL + error."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..pdf import parse_pdf
        from ..png import phash64
        from .multimodal import decode_rgb

        for pdf_batch in batches:
            rows = []
            for r in pdf_batch.itertuples(index=False):
                try:
                    res = parse_pdf(r.bytes)
                except Exception as e:
                    rows.append((r.doc_id, None, None, None, None, None,
                                 None, None, None, None, str(e)[:200]))
                    continue
                for pg in res["pages"]:
                    for idx, im in enumerate(pg["images"]):
                        ph, err = None, None
                        try:
                            if im["format"] in ("png", "jpeg"):
                                ph = phash64(decode_rgb(im["data"], im["format"]))
                        except Exception as e:
                            err = str(e)[:200]
                        rows.append(
                            (r.doc_id, pg["page_number"], idx, im["format"],
                             im["width"], im["height"], im["color_space"],
                             im["bits_per_component"], im["data"], ph, err)
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in PDF_IMAGE_SCHEMA.fields])

    return docs.select("doc_id", "bytes").mapInPandas(gen, PDF_IMAGE_SCHEMA)


def process_pdfs(docs: DataFrame) -> DataFrame:
    """(doc_id, bytes) → one row per page (plus a single error row for
    unparseable documents — failures land as data, never crash the
    job)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..pdf import clean_pdf_text, parse_pdf

        for pdf_batch in batches:
            rows = []
            for r in pdf_batch.itertuples(index=False):
                try:
                    res = parse_pdf(r.bytes)
                except Exception as e:
                    rows.append((r.doc_id, None, None, None, None, None,
                                 None, None, None, None, str(e)[:200]))
                    continue
                m = res["metadata"]
                created = m["created"].isoformat() if m["created"] else None
                for pg in res["pages"]:
                    rows.append(
                        (r.doc_id, pg["page_number"], pg["raw_text"],
                         clean_pdf_text(pg["page_number"], pg["raw_text"]),
                         pg["links"], len(pg["layout"]), m["title"],
                         m["author"], created, m["pages"], None)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in PDF_PAGE_SCHEMA.fields])

    return docs.select("doc_id", "bytes").mapInPandas(gen, PDF_PAGE_SCHEMA)
