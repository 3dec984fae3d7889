"""Deterministic synthetic crawl corpus (FIXTURES.md schemas).

Two generators:

* :func:`generate_corpus` — small-scale pandas tables (pages, links,
  seeds, robots, images) for correctness tests and the sf0.001 entry
  query.  A pure function of (seed, n_hosts, pages_per_host): same
  arguments → byte-identical tables.
* :func:`synth_frontier` — a `spark.range`-based distributed frontier
  generator for benchmarks: synthesizes N canonical URLs entirely with
  column expressions (no driver materialization, no Python), so it scales
  to 10^8+ rows in-sandbox and models the 10^10-row shape on a cluster.

Link-graph shape mirrors the reference's test fixtures
(tests/deep_crawling/test_deep_crawl_resume.py:40-100 uses pages whose
children are ``{url}/child{k}_{i}``): a 3-ary tree per host plus ~10%
cross links, ~5% noisy duplicate hrefs (fragment / tracking-param /
trailing-slash variants — seen-set dedup ground truth), ~10% external
links, and mailto:/javascript: noise.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..png import encode_png, phash64


def _encode_payload(image_id: str, rgb: np.ndarray, pick: int | None = None):
    """Encode a corpus image in a format chosen deterministically from
    its id — the image plane of the synthetic web mixes every real
    payload format (PNG / JPEG / lossless WebP / lossy WebP), so the
    e2e CrawlJob image emit exercises all four codecs.  Stored phash is
    the DECODED-pixel phash for lossy formats (the validate contract).
    ``pick`` (0=png 1=jpeg 2=vp8l 3=vp8) forces the format — the
    per-format bench's interface, instead of reaching into the id
    hash."""
    if pick is None:
        pick = _stable_int(image_id + ":fmt") % 4
    if pick == 0:
        return encode_png(rgb), "png", "png", phash64(rgb)
    if pick == 1:
        from ..jpeg import decode_jpeg, encode_jpeg

        data = encode_jpeg(rgb, quality=92)
        return data, "jpeg", "jpg", phash64(decode_jpeg(data))
    if pick == 2:
        from ..webp import encode_webp_lossless

        return (encode_webp_lossless(rgb, transforms=("subtract_green",), lz77=True),
                "webp", "webp", phash64(rgb))
    from ..vp8 import encode_webp_lossy
    from ..webp import decode_webp

    data = encode_webp_lossy(rgb, qi=4)
    return data, "webp", "webp", phash64(decode_webp(data))


def _stable_int(s: str) -> int:
    """Deterministic 31-bit int from a string (Python's hash() is salted
    per-process, so it must not seed RNGs)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big") & 0x7FFFFFFF

_SECTIONS = ["docs", "blog", "api", "2023", "2024", "admin"]
_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu crawl spark frontier queue bloom filter robot polite"
).split()


def host_name(h: int) -> str:
    return f"host{h}.example.com"


def page_url(h: int, i: int) -> str:
    if i == 0:
        return f"https://{host_name(h)}/"
    sec = _SECTIONS[i % len(_SECTIONS)]
    return f"https://{host_name(h)}/{sec}/p{i}"


def _words(rng: np.random.Generator, lo: int, hi: int) -> str:
    n = int(rng.integers(lo, hi + 1))
    return " ".join(_WORDS[j] for j in rng.integers(0, len(_WORDS), n))


def child_indices(i: int, pages_per_host: int, branching: int = 3) -> list[int]:
    """3-ary tree: children of node i are 3i+1..3i+3 (when in range)."""
    return [c for c in range(branching * i + 1, branching * i + branching + 1) if c < pages_per_host]


def _pdf_payload(pdf_id: str, h: int, i: int) -> bytes:
    """Deterministic PDF payload for the corpus: two text pages, a link
    annot, an embedded Flate RGB X-Object, and a DCTDecode JPEG on every
    third document — the write side of the pdf_pages/pdf_images emit."""
    from ..pdf import write_pdf

    k = _stable_int(pdf_id)
    rng = np.random.default_rng(k)
    rgb = rng.integers(0, 256, (6 + k % 4, 8 + k % 5, 3), dtype=np.uint8)
    images = [{"kind": "flate", "pixels": rgb, "predictor": k % 2 == 0}]
    if k % 3 == 0:
        from ..jpeg import encode_jpeg

        images.append(
            {"kind": "dct", "data": encode_jpeg(np.ascontiguousarray(rgb), quality=92),
             "w": rgb.shape[1], "h": rgb.shape[0]}
        )
    pages = [
        {
            "lines": [(72, 720, 14, f"Report {h}-{i}"),
                      (72, 700, 10, f"Body {_WORDS[k % len(_WORDS)]} {k % 97}")],
            "links": [f"https://ref{k % 5}.example.com/pdfcite/{i}"],
            "images": images,
        },
        {"lines": [(72, 720, 10, f"Appendix {_WORDS[(k + 7) % len(_WORDS)]}")]},
    ]
    return write_pdf(pages, title=f"Report {h}-{i}", compress=(k % 2 == 0))


def generate_corpus(
    seed: int = 42,
    n_hosts: int = 10,
    pages_per_host: int = 20,
    images_per_page: int = 1,
    img_sizes: tuple[int, ...] = (32, 48, 64),
    with_images: bool = True,
    with_pdfs: bool = False,
) -> dict[str, pd.DataFrame]:
    """Build the corpus tables as pandas DataFrames (with_pdfs adds a
    ``pdfs`` payload table plus on-page ``<a href=.../files/x.pdf>``
    links — the document plane of the synthetic web; each PDF is linked
    from exactly one page)."""
    rng = np.random.default_rng(seed)
    pages, links, images, pdfs = [], [], [], []

    for h in range(n_hosts):
        for i in range(pages_per_host):
            url = page_url(h, i)
            depth_hint = 0
            k = i
            while k > 0:
                k = (k - 1) // 3
                depth_hint += 1
            title = f"{_SECTIONS[i % len(_SECTIONS)]} page {i} " + _words(rng, 2, 4)
            desc = _words(rng, 4, 8)
            body_links = []

            def add_link(href, text, title_a="", rel="", cls="", external=False):
                body_links.append((href, text, title_a, rel, cls))
                links.append(
                    dict(
                        src_url=url,
                        href=href,
                        text=text,
                        title=title_a,
                        rel=rel,
                        **{"class": cls},
                        is_external=external,
                    )
                )

            for ci in child_indices(i, pages_per_host):
                curl = page_url(h, ci)
                # mix of absolute and root-relative hrefs
                href = curl if rng.random() < 0.5 else curl.replace(f"https://{host_name(h)}", "")
                add_link(href, f"link to p{ci} " + _words(rng, 1, 3), title_a=f"t{ci}")
                # ~5% noisy duplicates: same target, different raw href
                noise = rng.random()
                if noise < 0.05:
                    add_link(curl + "#section2", f"dup frag p{ci}")
                elif noise < 0.10:
                    sep = "&" if "?" in curl else "?"
                    add_link(curl + f"{sep}utm_source=news&ref=x", f"dup track p{ci}")
                elif noise < 0.15 and curl.endswith(tuple("0123456789")):
                    add_link(curl + "/", f"dup slash p{ci}")
            # ~10% cross links within host
            if rng.random() < 0.30 and pages_per_host > 1:
                t = int(rng.integers(0, pages_per_host))
                add_link(page_url(h, t), f"cross p{t}")
            # ~10% external links
            if rng.random() < 0.30 and n_hosts > 1:
                eh = int((h + 1 + rng.integers(0, n_hosts - 1)) % n_hosts)
                add_link(page_url(eh, int(rng.integers(0, pages_per_host))), "external", external=True)
            # scheme noise
            if rng.random() < 0.15:
                add_link("mailto:a@b.com", "mail", external=True)
            if rng.random() < 0.15:
                add_link("javascript:void(0)", "js", external=True)

            if with_pdfs and i % 4 == 1:
                pdf_id = f"pdf-{h:04d}-{i:05d}"
                pdfs.append(
                    dict(pdf_id=pdf_id, bytes=_pdf_payload(pdf_id, h, i), page_url=url)
                )
                add_link(f"/files/{pdf_id}.pdf", f"PDF report {h}-{i}", cls="pdf-link")

            img_tags = []
            if with_images:
                for j in range(images_per_page):
                    image_id = f"img-{h:04d}-{i:05d}-{j:02d}"
                    irng = np.random.default_rng(_stable_int(image_id))
                    w = int(irng.choice(img_sizes))
                    hh = int(irng.choice(img_sizes))
                    rgb = irng.integers(0, 256, (hh, w, 3), dtype=np.uint8)
                    data, fmt, ext, ph = _encode_payload(image_id, rgb)
                    caption = f"caption {image_id}: " + " ".join(
                        _WORDS[x] for x in irng.integers(0, len(_WORDS), int(irng.integers(3, 11)))
                    )
                    images.append(
                        dict(
                            image_id=image_id,
                            bytes=data,
                            w=w,
                            h=hh,
                            fmt=fmt,
                            caption=caption,
                            phash=ph,
                            page_url=url,
                        )
                    )
                    img_tags.append(
                        f'<img src="/img/{image_id}.{ext}" alt="{caption}" '
                        f'width="{w}" height="{hh}">'
                    )
                # decoy icon that image scoring must reject
                if i % 4 == 0:
                    img_tags.append('<img src="/img/icon-logo.png" alt="" width="16" height="16" class="logo icon">')

            a_tags = "\n".join(
                f'<a href="{href}"'
                + (f' title="{t}"' if t else "")
                + (f' rel="{r}"' if r else "")
                + (f' class="{c}"' if c else "")
                + f">{txt}</a>"
                for href, txt, t, r, c in body_links
            )
            html = (
                f"<html><head><title>{title}</title>"
                f'<meta name="description" content="{desc}"></head>'
                f"<body><h1>{title}</h1><p>{_words(rng, 10, 30)}</p>\n"
                f"{a_tags}\n" + "\n".join(img_tags) + "</body></html>"
            )
            pages.append(
                dict(
                    url=url,
                    host=host_name(h),
                    depth_hint=depth_hint,
                    head_html=f"<head><title>{title}</title></head>",
                    html=html,
                    status_code=200,
                )
            )

    seeds = []
    for h in range(n_hosts):
        seeds.append(dict(url=page_url(h, 0), priority=1.0, source="sitemap" if h % 2 == 0 else "cc"))
        if h % 3 == 0:  # cross-source duplicate seed (union + dedup path)
            seeds.append(dict(url=page_url(h, 0), priority=0.9, source="cc"))

    robots = []
    for h in range(n_hosts):
        if h == 0:
            continue  # no robots row → allow-all fallback (utils.py:350-355)
        if n_hosts > 2 and h == n_hosts - 1:
            rules = "User-agent: *\nDisallow: /"
        elif h % 5 == 1:
            rules = "User-agent: *\nDisallow: /admin/"
        else:
            rules = "User-agent: *\nAllow: /"
        robots.append(
            dict(
                host=host_name(h),
                rules=rules,
                crawl_delay=0.5 + (h % 4) * 0.5,
                fetch_time=1_700_000_000,
            )
        )

    out = {
        "pages": pd.DataFrame(pages),
        "links": pd.DataFrame(links),
        "seeds": pd.DataFrame(seeds),
        "robots": pd.DataFrame(robots),
    }
    if with_images:
        out["images"] = pd.DataFrame(images)
    if with_pdfs:
        out["pdfs"] = pd.DataFrame(pdfs)
    return out


def synth_frontier(spark, n_urls: int, n_hosts: int = 1000, seed: int = 42, depth_mod: int = 6):
    """Distributed synthetic frontier: N canonical URLs via pure column
    expressions over ``spark.range`` — the bench-scale input shape.

    Host assignment is zipf-ish (host_id = id % n_hosts skewed by a
    squared residual) so hot-host skew is present, as it would be on a
    real 10^10 frontier.
    """
    from pyspark.sql import functions as F

    df = spark.range(n_urls)
    # skew: ~1/16 of rows pile onto 8 hot hosts
    hot = (F.xxhash64(F.col("id"), F.lit(seed)) % 16 == 0).cast("int")
    host_id = F.when(hot == 1, F.pmod(F.col("id"), F.lit(8))).otherwise(
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(n_hosts))
    )
    sec = F.element_at(
        F.array(*[F.lit(s) for s in _SECTIONS]), (F.pmod(F.col("id"), F.lit(len(_SECTIONS))) + 1).cast("int")
    )
    url = F.concat(
        F.lit("https://host"), host_id.cast("string"), F.lit(".example.com/"), sec,
        F.lit("/p"), F.col("id").cast("string"),
    )
    return (
        df.select(
            url.alias("url"),
            F.concat(F.lit("host"), host_id.cast("string"), F.lit(".example.com")).alias("host"),
            F.pmod(F.col("id"), F.lit(depth_mod)).cast("int").alias("depth"),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(1000)) / 1000.0).alias("score"),
            F.lit(0).alias("retry_count"),
        )
    )
