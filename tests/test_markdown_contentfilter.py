"""Markdown generation + content filters (PruningContentFilter /
chunk-level BM25ContentFilter) — golden tests plus execution of the
reference's own clean_tokens/fast_urljoin via AST extraction."""

import math

import pytest

from crawl4ai_spark.functions.markdown import (
    convert_links_to_citations,
    fast_urljoin,
    generate_markdown,
    html_to_markdown,
    markdown_for_pages,
)
from crawl4ai_spark.operators.content_filter import (
    bm25_chunks,
    bm25_filter_content,
    bm25_okapi_scores,
    clean_element,
    clean_tokens,
    composite_score,
    extract_text_chunks,
    fit_content,
    page_chunks_bm25,
    pruning_filter_content,
)
from crawl4ai_spark.functions.dom import ensure_body, parse_dom

from reference_loader import load_defs


# ---------------------------------------------------------------- xchecks
def test_clean_tokens_xcheck_reference():
    ref = load_defs("utils.py", ["clean_tokens"])["clean_tokens"]
    samples = [
        ["the", "quick", "brown", "fox", "at", "up", "↑top", "ab", "can't", "data"],
        [],
        ["running", "with", "scissors", "n't", "none", "alpha"],
    ]
    for toks in samples:
        assert clean_tokens(toks) == ref(toks)


def test_fast_urljoin_xcheck_reference():
    ref = load_defs("markdown_generation_strategy.py", ["fast_urljoin"])["fast_urljoin"]
    cases = [
        ("https://a.com/page", "/x/y"),
        ("https://a.com/page/", "/x/y"),
        ("https://a.com/page", "rel/z"),
        ("https://a.com/page", "https://b.com/q"),
        ("https://a.com/page", "//cdn.com/q"),
        ("https://a.com/page", "mailto:a@b.c"),
    ]
    for base, url in cases:
        assert fast_urljoin(base, url) == ref(base, url)


# ------------------------------------------------------------- markdown
HTML = (
    '<html><head><title>T</title></head><body><h1>Title 5</h1>'
    '<p>See <a href="/docs/5">guide 5</a> and '
    '<a href="https://ext.example.org/x" title="Ext T">ext link</a> now.</p>'
    "<ul><li>one</li><li>two <b>bold</b></li></ul>"
    "<pre>code block</pre><blockquote><p>quoted</p></blockquote></body></html>"
)


def test_html_to_markdown_golden():
    md = html_to_markdown(HTML)
    assert md == (
        "# Title 5\n"
        'See [guide 5](/docs/5) and [ext link](https://ext.example.org/x "Ext T") now.\n'
        "* one\n"
        "* two **bold**\n"
        "```\ncode block\n```\n"
        "> quoted\n"
    )


def test_citations_reference_semantics():
    md, refs = convert_links_to_citations(
        'See [guide](/docs/5) and [ext](https://e.org/x "T") and [guide](/docs/5).',
        base_url="https://h.example.com/page",
    )
    # repeated link reuses the first number (markdown_generation_strategy.py:121-128)
    assert md == "See guide⟨1⟩ and ext⟨2⟩ and guide⟨1⟩."
    assert refs == (
        "\n\n## References\n\n"
        "⟨1⟩ https://h.example.com/page/docs/5: guide\n"
        "⟨2⟩ https://e.org/x: T - ext\n"
    )


def test_citation_image_form():
    md, _ = convert_links_to_citations("![alt text](/img/a.png)", base_url="https://h.com")
    assert md == "![alt text⟨1⟩]"


def test_markdown_for_pages_spark(spark):
    pages = spark.createDataFrame([("https://h.com/p", HTML)], "url string, html string")
    row = markdown_for_pages(pages).collect()[0]
    assert row["raw_markdown"].startswith("# Title 5")
    assert "guide 5⟨1⟩" in row["markdown_with_citations"]
    assert "## References" in row["references_markdown"]


# ------------------------------------------------------- chunk extraction
CHUNK_HTML = (
    "<html><head><title>alphaq overview</title></head><body>"
    "<h1>alphaq heading words</h1>"
    "<p>betaq betaq filler words content</p>"
    '<div class="x"><span>inline</span> tail of div</div>'
    "<p>gammaq deep block</p>"
    "</body></html>"
)


def test_extract_text_chunks_order_and_tags():
    body = ensure_body(parse_dom(CHUNK_HTML))
    chunks = extract_text_chunks(body)
    texts = [(t, tag.tag, tt) for _i, t, tt, tag in chunks]
    # note "inlinetail": the reference strips EACH string node then joins
    # with "" (content_filter_strategy.py:222-224) — pinned
    assert texts == [
        ("alphaq heading words", "h1", "header"),
        ("betaq betaq filler words content", "p", "content"),
        ("inlinetail of div", "div", "content"),
        ("gammaq deep block", "p", "content"),
    ]


def test_bm25_chunks_scoring():
    out = bm25_chunks(CHUNK_HTML, user_query="alphaq betaq gammaq")
    assert [tag for _i, _c, tag, _r, _a in out] == ["h1", "p", "div", "p"]
    # independent recomputation of the BM25Okapi formula
    corpus = [
        ["alphaq", "heading", "words"],
        ["betaq", "betaq", "filler", "words", "content"],
        ["inlinetail", "div"],
        ["gammaq", "deep", "block"],
    ]
    scores = bm25_okapi_scores(corpus, ["alphaq", "betaq", "gammaq"])
    for (idx, _c, tag, raw, adj), expect in zip(out, scores):
        assert raw == pytest.approx(expect)
        assert adj == pytest.approx(expect * (5.0 if tag == "h1" else 1.0))


def test_bm25_okapi_epsilon_floor():
    # a term in most docs gets negative idf → floored to 0.25 * avg_idf
    corpus = [["common", "unique1"], ["common", "unique2"], ["common", "unique3"]]
    n, N = 3, 3
    idf_common = math.log(N - n + 0.5) - math.log(n + 0.5)
    assert idf_common < 0
    idf_unique = math.log(N - 1 + 0.5) - math.log(1.5)
    avg = (idf_common + 3 * idf_unique) / 4
    got = bm25_okapi_scores(corpus, ["common"])
    expect = 0.25 * avg * (1 * 2.5) / (1 + 1.5 * (1 - 0.75 + 0.75 * 1.0))
    assert got[0] == pytest.approx(expect)


def test_bm25_filter_content_threshold_and_order():
    blocks = bm25_filter_content(CHUNK_HTML, user_query="alphaq gammaq", bm25_threshold=0.8)
    # h1 (weight 5) and the gammaq paragraph pass; order is document order
    assert blocks[0].startswith("<h1>")
    assert any("gammaq" in b for b in blocks)
    assert all("betaq" not in b for b in blocks)
    # at threshold 1.0 the unweighted paragraph (~0.88) drops, h1 stays
    hi = bm25_filter_content(CHUNK_HTML, user_query="alphaq gammaq", bm25_threshold=1.0)
    assert hi and all(b.startswith("<h1>") for b in hi)


def test_bm25_stemming_unsupported():
    with pytest.raises(NotImplementedError):
        bm25_chunks(CHUNK_HTML, user_query="x", use_stemming=True)


# --------------------------------------------------------------- pruning
PRUNE_HTML = (
    "<html><body>"
    "<p>This paragraph carries a healthy amount of meaningful readable text "
    "for density scoring purposes and should clearly survive pruning.</p>"
    '<div class="ads-banner"><a href="/c">ad link</a></div>'
    "<article>Long form article body text that is dense and informative, "
    "with plenty of content to keep its composite score high.</article>"
    "</body></html>"
)


def test_composite_score_quirks():
    body = ensure_body(parse_dom(PRUNE_HTML))
    p, div, art = body.element_children()
    # p: pure text → density 1, no links
    text = p.get_text(strip=True)
    expect_p = (
        0.4 * 1.0 + 0.2 * 1.0 + 0.2 * 1.0 + 0.1 * 0.0 + 0.1 * math.log(len(text) + 1)
    )
    assert composite_score(p) == pytest.approx(expect_p)
    # div: all text is link text → link density 0; negative class clipped
    # to 0 by the reference's max(0, class_score) (:758 — pinned quirk)
    inner = div.inner_html()
    lt = len("ad link")
    expect_div = (
        0.4 * (lt / len(inner)) + 0.2 * 0.0 + 0.2 * 0.5 + 0.1 * 0.0
        + 0.1 * math.log(lt + 1)
    )
    assert composite_score(div) == pytest.approx(expect_div)


def test_pruning_filter_drops_link_farm():
    blocks = pruning_filter_content(PRUNE_HTML, threshold=0.48)
    assert len(blocks) == 2
    assert blocks[0].startswith("<p>") and blocks[1].startswith("<article>")


def test_pruning_dynamic_threshold_runs():
    blocks = pruning_filter_content(PRUNE_HTML, threshold=0.48, threshold_type="dynamic")
    assert any(b.startswith("<article>") for b in blocks)


def test_pruning_min_word_threshold():
    blocks = pruning_filter_content(PRUNE_HTML, threshold=0.0, min_word_threshold=5)
    # the ad div (2 words) scores -1.0 → removed even at threshold 0
    assert all("ads-banner" not in b for b in blocks)


def test_clean_element_strips_unwanted():
    node = parse_dom('<div class="x" style="c" data-k="v"><script>x</script><p>t</p></div>').find("div")
    assert clean_element(node) == '<div data-k="v"><p>t</p></div>'


def test_fit_content_spark(spark):
    pages = spark.createDataFrame([("u", PRUNE_HTML)], "url string, html string")
    row = fit_content(pages, mode="pruning").collect()[0]
    assert row["n_blocks"] == 2
    assert "<div><p>" in row["fit_html"]
    assert "healthy amount" in row["fit_markdown"]


def test_page_chunks_bm25_spark(spark):
    pages = spark.createDataFrame([("u", CHUNK_HTML)], "url string, html string")
    rows = page_chunks_bm25(pages, user_query="alphaq betaq gammaq").orderBy("chunk_idx").collect()
    assert [r["tag"] for r in rows] == ["h1", "p", "div", "p"]
    assert rows[0]["adjusted"] == pytest.approx(rows[0]["bm25"] * 5.0)


def test_crawljob_emits_markdown(spark, tmp_path):
    from crawl4ai_spark.operators.traversal import canonical_corpus_fetcher
    from crawl4ai_spark.pipeline import CrawlJob, JobConfig
    from crawl4ai_spark.sources.corpus import generate_corpus, page_url

    corpus = generate_corpus(seed=11, n_hosts=2, pages_per_host=5, with_images=False)
    pages = spark.createDataFrame(corpus["pages"])
    cfg = JobConfig(max_depth=2, wave_budget=100.0, use_bloom=False,
                    emit_images=False, emit_markdown=True,
                    markdown_fit_mode="pruning")
    job = CrawlJob(spark, canonical_corpus_fetcher(pages), catalog_root=str(tmp_path),
                   config=cfg)
    job.seed(spark.createDataFrame([(page_url(0, 0),), (page_url(1, 0),)], "url string"))
    job.run(max_waves=4)
    md = job.markdown()
    assert md is not None
    rows = md.collect()
    ok_urls = {r["url"] for r in job.results().filter("success").collect()}
    assert {r["url"] for r in rows} == ok_urls
    assert all(r["raw_markdown"].startswith("# ") for r in rows)  # corpus pages open with h1
    assert any("## References" in r["references_markdown"] for r in rows)
    assert all(r["fit_html"] is not None for r in rows)


# ---------------------------------------------------------------------------
# html2text option trio (markdown_generation_strategy.py:182-186) — CROSS-
# EXECUTED against the reference's vendored html2text package (pure Python;
# imported from a temp copy because crawl4ai/types.py shadows stdlib types)
# ---------------------------------------------------------------------------

def _ref_html2text():
    import shutil
    import sys
    import tempfile

    d = tempfile.mkdtemp(prefix="h2t_")
    shutil.copytree("/root/reference/crawl4ai/html2text", d + "/html2text")
    sys.path.insert(0, d)
    try:
        import html2text  # noqa: F401
    finally:
        sys.path.remove(d)
    return sys.modules["html2text"]


def test_markdown_option_trio_xcheck():
    from crawl4ai_spark.functions.markdown import html_to_markdown

    h2t = _ref_html2text()
    base = "https://h7.example.com/page"
    src = (
        '<p>See <a href="/docs/7">guide 7</a> and '
        '<a href="https://ext.example.org/x7" title="Ext0">ext</a>.</p>'
    )
    img_src = '<p>x <img src="/i.png" alt="a"> y</p>'

    def ref(html, **kw):
        h = h2t.HTML2Text(baseurl=base)
        h.body_width = 0
        h.single_line_break = True
        for k, v in kw.items():
            setattr(h, k, v)
        return h.handle(html)

    for html, kw in [
        (src, {}),
        (src, {"ignore_links": True}),
        (src, {"protect_links": True}),  # pre-join <> bracketing quirk
        (img_src, {"ignore_images": True}),
        (img_src, {}),
    ]:
        assert html_to_markdown(html, base, **kw) == ref(html, **kw), kw


def test_markdown_extended_options_xcheck():
    """Extended html2text option surface (VERDICT r3 item 5) — each
    option cross-executed byte-identical against the vendored package.
    Dialect defaults diverge on emphasis_mark ('*' vs '_') and
    unicode_snob (True vs False), so the html2text value is passed
    explicitly where it matters."""
    from crawl4ai_spark.functions.markdown import html_to_markdown

    h2t = _ref_html2text()
    base = "https://h7.example.com/page"

    def ref(html, slb=True, bw=0, **kw):
        h = h2t.HTML2Text(baseurl=base)
        h.body_width = bw
        h.single_line_break = slb
        for k, v in kw.items():
            setattr(h, k, v)
        return h.handle(html)

    em_src = "<p>a <em>x</em> and <strong>y</strong> b</p>"
    esc_src = "<p>stars *x* and #hash and back\\slash here</p>"
    ent_src = "<p>em&mdash;dash caf&eacute; it&rsquo;s a&nbsp;b &larr;ok&rarr;</p>"
    long_src = ("<p>" + " ".join(f"word{i}" for i in range(30)) + "</p>"
                + "<p>short</p>")
    bq_src = "<blockquote>" + " ".join(f"tok{i}" for i in range(25)) + "</blockquote>"
    link_long = ('<p>see <a href="/a">x</a> '
                 + " ".join(f"w{i}" for i in range(25)) + "</p>")

    cases = [
        # (html, mine-kwargs, vendored-kwargs, slb, bw)
        (em_src, {"emphasis_mark": "_", "unicode_snob": False}, {}, True, 0),
        (em_src, {"ignore_emphasis": True, "unicode_snob": False},
         {"ignore_emphasis": True}, True, 0),
        (em_src, {"emphasis_mark": "*", "strong_mark": "__", "unicode_snob": False},
         {"emphasis_mark": "*", "strong_mark": "__"}, True, 0),
        (esc_src, {"escape_snob": True, "unicode_snob": False},
         {"escape_snob": True}, True, 0),
        (esc_src, {"unicode_snob": False}, {}, True, 0),  # default backslash-escape
        (ent_src, {"unicode_snob": False}, {}, True, 0),  # ascii unification
        (ent_src, {"unicode_snob": True}, {"unicode_snob": True}, True, 0),
        (long_src, {"body_width": 40, "unicode_snob": False}, {}, False, 40),
        (long_src, {"body_width": 78, "unicode_snob": False}, {}, False, 78),
        (bq_src, {"body_width": 40, "unicode_snob": False}, {}, False, 40),
        (link_long, {"body_width": 40, "unicode_snob": False}, {}, False, 40),
    ]
    for html, mine_kw, ref_kw, slb, bw in cases:
        got = html_to_markdown(html, base, **mine_kw)
        want = ref(html, slb=slb, bw=bw, **ref_kw)
        assert got == want, (mine_kw, repr(got), repr(want))


def test_markdown_unifiable_literal_divergence():
    """Pin the ONE documented dialect divergence of the option layer
    (ADVICE r4, markdown.py escape() docstring): with unicode_snob=False
    the vendored html2text (convert_charrefs=False) unifies only
    characters that arrived as entities/charrefs, so a LITERAL unicode
    em-dash in source HTML survives as '—' there; our DOM layer decodes
    entities before rendering (entity-origin is unrecoverable), so we
    translate UNIFIABLE codepoints uniformly and the literal em-dash
    becomes '--'.  Entity and charref spellings are byte-identical in
    both engines."""
    from crawl4ai_spark.functions.markdown import html_to_markdown

    h2t = _ref_html2text()

    def ref(html):
        h = h2t.HTML2Text()
        h.body_width = 0
        h.single_line_break = True
        h.unicode_snob = False
        return h.handle(html)

    # entity + numeric charref forms: byte-identical, both unify to '--'
    for src in ("<p>a&mdash;b</p>", "<p>a&#8212;b</p>"):
        got, want = html_to_markdown(src, unicode_snob=False), ref(src)
        assert got == want == "a--b\n", (src, repr(got), repr(want))
    # literal unicode char: the pinned divergence
    lit = "<p>a—b</p>"
    assert ref(lit) == "a—b\n"  # vendored keeps the raw codepoint
    assert html_to_markdown(lit, unicode_snob=False) == "a--b\n"  # we unify
    # unicode_snob=True keeps the codepoint in BOTH engines
    assert html_to_markdown(lit, unicode_snob=True) == "a—b\n"


def test_markdown_u_tag_and_emphasis_spacing():
    from crawl4ai_spark.functions.markdown import html_to_markdown

    h2t = _ref_html2text()

    def ref(html, **kw):
        h = h2t.HTML2Text()
        h.body_width = 0
        h.single_line_break = True
        for k, v in kw.items():
            setattr(h, k, v)
        return h.handle(html)

    # <u> rides the emphasis machinery (:422); no-space-before corner
    # inserts the renderability space after alphanumerics
    for html in ("<p>x <u>under</u> y</p>", "<p>pre<em>em</em> y</p>"):
        assert html_to_markdown(html, emphasis_mark="_", unicode_snob=False) == ref(html)


def test_markdown_link_image_strike_quote_options_xcheck():
    """Batch 2 of the option surface: automatic/internal links,
    images_to_alt + default_image_alt, strikethrough, q-tag quotes,
    mark_code — cross-executed byte-identical against the vendored
    package (unicode_snob pinned False = its default)."""
    from crawl4ai_spark.functions.markdown import html_to_markdown

    h2t = _ref_html2text()

    def ref(html, base="", **kw):
        h = h2t.HTML2Text(baseurl=base)
        h.body_width = 0
        h.single_line_break = True
        for k, v in kw.items():
            setattr(h, k, v)
        return h.handle(html)

    auto = '<p>see <a href="https://x.test/a">https://x.test/a</a> and <a href="#frag">anchor</a> end</p>'
    imgs = '<p>x <img src="/i.png" alt="pic"> y <img src="/j.png"> z</p>'
    strike = "<p>a <del>gone</del> b <s>also</s> c</p>"
    quote = "<p>he said <q>hi there</q> ok</p>"
    pre = "<p>before</p><pre>line1\nline2</pre><p>after</p>"

    cases = [
        (auto, "", {}, {}),  # defaults: <url> + fragment dropped, both sides
        (auto, "", {"use_automatic_links": False, "skip_internal_links": False},
         {"use_automatic_links": False, "skip_internal_links": False}),
        (imgs, "", {"images_to_alt": True, "default_image_alt": "noalt"},
         {"images_to_alt": True, "default_image_alt": "noalt"}),
        (imgs, "https://b.test/", {"default_image_alt": "noalt"},
         {"default_image_alt": "noalt"}),
        (strike, "", {}, {}),
        (quote, "", {}, {}),
        (quote, "", {"open_quote": "«", "close_quote": "»"},
         {"open_quote": "«", "close_quote": "»"}),
        (pre, "", {"mark_code": True}, {"mark_code": True}),
    ]
    for html, base, mine_kw, ref_kw in cases:
        got = html_to_markdown(html, base, unicode_snob=False, **mine_kw)
        want = ref(html, base=base, **ref_kw)
        assert got == want, (mine_kw, repr(got), repr(want))


def test_markdown_wrap_links_option_xcheck():
    """wrap_links=False exempts link-bearing paragraphs from body_width
    wrapping (optwrap/skipwrap RE_LINK rule) — cross-executed."""
    from crawl4ai_spark.functions.markdown import html_to_markdown

    h2t = _ref_html2text()
    src = ('<p>see <a href="/a">x</a> ' + " ".join(f"w{i}" for i in range(25)) + "</p>"
           "<p>" + " ".join(f"v{i}" for i in range(25)) + "</p>")
    for wl in (True, False):
        h = h2t.HTML2Text()
        h.body_width = 40
        h.single_line_break = False
        h.wrap_links = wl
        want = h.handle(src)
        got = html_to_markdown(src, body_width=40, unicode_snob=False, wrap_links=wl)
        assert got == want, (wl, repr(got), repr(want))


def test_markdown_table_modes_xcheck():
    """html2text table-family options (vendored __init__.py:680-733,
    utils.py:237-311): ignore_tables, bypass_tables, pad_tables True and
    False — each cross-executed byte-identical against the vendored
    package over headers, raggedness, empty rows, captions, block cell
    content, and adjacency (table→table, table→text, doc-end).  Lists
    inside cells are excluded: they render in this engine's golden list
    dialect (documented divergence, see _render_table_h2t)."""
    from crawl4ai_spark.functions.markdown import html_to_markdown

    h2t = _ref_html2text()
    base = "https://t.example.com/p"

    def ref(html, **kw):
        h = h2t.HTML2Text(baseurl=base)
        h.body_width = 0
        h.single_line_break = True
        for k, v in kw.items():
            setattr(h, k, v)
        return h.handle(html)

    T1 = "<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>"
    cases = {
        "header": T1,
        "sandwich": "<p>before</p><table><tr><td>x1</td><td>x2</td></tr>"
                    "<tr><td>longer cell</td><td>y</td></tr></table><p>after</p>",
        "single": "<table><tr><td>only</td></tr></table>",
        "sections": "<table><thead><tr><th>A</th><th>B</th></tr></thead>"
                    "<tbody><tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></tbody></table>",
        "stress": "<table><tr><td>x<b>y</b></td><td>12</td></tr></table>",
        "linkimg": "<table><tr><td><a href='/l'>link</a></td>"
                   "<td><img src='/i.png' alt='im'></td></tr></table>",
        "empty_first_tr": "<table><tr></tr><tr><td>a</td><td>b</td></tr></table>",
        "two_tables_text": T1 + "<p>mid</p>" + T1,
        "two_tables_adjacent": T1 + T1,
        "doc_end": "<table><tr><td>a</td></tr></table>",
        "para_cells": "<table><tr><td><p>a</p><p>b</p></td><td>c</td></tr></table>",
        "empty_mid_tr": "<table><tr><td>a</td></tr><tr></tr><tr><td>b</td></tr></table>",
        "empty_table": "<table><tr></tr></table>",
        "empty_table_mid": "<p>x</p><table><tr></tr></table><p>y</p>",
        "mixed_block_tail": "<table><tr><td>x<p>a</p></td></tr></table>",
        "mixed_block_head": "<table><tr><td><p>a</p>x</td></tr></table>",
        "ragged": "<table><tr><td>c1</td><td>c2</td><td>c3</td></tr>"
                  "<tr><td>1</td><td>2</td></tr>"
                  "<tr><td>1</td><td>2</td><td>3</td><td>4</td></tr></table>",
        "caption": "<p>x</p><table><caption>cap <b>b</b></caption>"
                   "<tr><td>a</td><td>c</td></tr><tr><td>d</td><td>e</td></tr></table>",
        "caption_only": "<table><caption>c</caption></table>",
        "nested_div": "<div><table><tr><td>a</td></tr></table></div>",
        "th_only": "<table><tr><th>only th</th></tr></table>",
        "dashes": "<table><tr><td>a-b|c</td><td>d</td></tr>"
                  "<tr><td>-</td><td>--</td></tr></table>",
        "entities": "<table><tr><td>multi  space</td><td>x&amp;y</td></tr></table>",
        "blank_cells": "<table><tr><td></td><td></td></tr>"
                       "<tr><td>a</td><td>b</td></tr></table>",
        "headings_around": "<h2>head</h2><table><tr><td>a</td></tr></table><h2>tail</h2>",
    }
    modes = [
        {"ignore_tables": True},
        {"bypass_tables": True},
        {"pad_tables": True},
        {"pad_tables": False},
    ]
    for mode in modes:
        for name, src in cases.items():
            want = ref(src, **mode)
            got = html_to_markdown(src, base, **mode)
            assert got == want, (name, mode, repr(got), repr(want))


def test_markdown_image_mailto_options_xcheck():
    """ignore_mailto_links + images_as_html + images_with_size
    (html2text/__init__.py:71-75,516-521,562-580) — cross-executed
    byte-identical against the vendored package in the block writer."""
    from crawl4ai_spark.functions.markdown import html_to_markdown

    h2t = _ref_html2text()
    base = "https://h8.example.com/page"

    def ref(html, **kw):
        h = h2t.HTML2Text(baseurl=base)
        h.body_width = 0
        h.single_line_break = True
        for k, v in kw.items():
            setattr(h, k, v)
        return h.handle(html)

    mail = ('<p>write <a href="mailto:a@b.c">me</a> or '
            '<a href="/contact">form</a></p>')
    imgs = ('<p>x <img src="/i.png" alt="pic" width="64" height="32"> '
            '<img src="/j.png" alt="plain"> y</p>')
    img_h_only = '<p><img src="/k.png" height="9"></p>'
    for html, kw in [
        (mail, {"ignore_mailto_links": True}),
        (mail, {}),
        (imgs, {"images_as_html": True}),
        (imgs, {"images_with_size": True}),
        (img_h_only, {"images_with_size": True}),
        (imgs, {"images_with_size": True, "default_image_alt": "dflt"}),
        (imgs, {}),
    ]:
        assert html_to_markdown(html, base, **kw) == ref(html, **kw), kw


def test_markdown_google_doc_xcheck():
    """google_doc mode (html2text/__init__.py:79,237-307,331-347,373-377,
    477-480,637-668,776-783; utils.py:21-160) — the Google-Docs-export
    dialect cross-executed byte-identical on the full behavior matrix:
    style-class emphasis (bold/italic/fixed/strikethrough) with parent
    suppression and the drop-white-space/empty-emphasis quirks, soft
    p/div boundaries vs height-styled hard breaks, marks straddling
    queued breaks, flat-list re-nesting from li margin-left,
    list-style-type ol/ul detection, headers staying clean, and
    hide_strikethrough silencing line-through runs."""
    from crawl4ai_spark.functions.markdown import html_to_markdown

    h2t = _ref_html2text()
    base = "https://g.example.com/doc"

    def ref(html, **kw):
        h = h2t.HTML2Text(baseurl=base)
        h.body_width = 0
        h.single_line_break = True
        h.google_doc = True
        h.emphasis_mark = "*"
        h.unicode_snob = True
        for k, v in kw.items():
            setattr(h, k, v)
        return h.handle(html)

    style = (
        "<style>.b{font-weight:700}.i{font-style:italic}"
        ".bi{font-weight:bold;font-style:italic}"
        ".st{text-decoration:line-through}.mono{font-family:courier new}"
        ".h{height:11pt}.lst0{margin-left:36pt}.lst1{margin-left:72pt}"
        "ul.x{list-style-type:disc}</style>"
    )
    fixtures = {
        "plain_p": "<p class=c><span>hello world</span></p><p><span>second para</span></p>",
        "height_p": '<p class=h><span>has height</span></p><p class=h><span>second</span></p>',
        "bold_span": "<p class=h><span>a </span><span class=b>bold</span><span> z</span></p>",
        "bold_spaces": "<p class=h><span>a</span><span class=b> bold </span><span>z</span></p>",
        "italic_bold": "<p class=h><span class=bi>both</span><span> tail</span></p>",
        "empty_emphasis": "<p class=h><span class=b> </span><span>after</span></p>",
        "nested_same": '<p class=h><span class=b>outer <span class=b>inner</span> done</span></p>',
        "strike": "<p class=h><span>keep </span><span class=st>gone</span><span> end</span></p>",
        "strike_bold": '<p class=h><span class="st b">bs</span><span> t</span></p>',
        "mono": "<p class=h><span>x </span><span class=mono>code bit</span><span> y</span></p>",
        "list_flat": ('<ul class=x><li class=lst0><span>one</span></li>'
                      '<li class=lst0><span>two</span></li></ul>'
                      '<p class=h><span>after</span></p>'),
        "list_nested": ('<ul class=x><li class=lst0><span>one</span></li></ul>'
                        '<ul class=x><li class=lst1><span>sub</span></li></ul>'
                        '<ul class=x><li class=lst0><span>two</span></li></ul>'),
        "ol_styled": ('<ol style="list-style-type:decimal">'
                      '<li class=lst0><span>first</span></li>'
                      '<li class=lst0><span>second</span></li></ol>'),
        "ul_default_ol": '<ul><li class=lst0><span>notype</span></li></ul>',
        "header_clean": ('<h1 class=b><span>Title</span></h1>'
                         '<p class=h><span class=b>bold body</span></p>'),
        "inline_style": ('<p class=h><span style="font-weight:bold">direct</span>'
                         '<span> t</span></p>'),
        "p_level_bold": '<p class="h b"><span>all bold</span></p>',
        "link_in_bold": '<p class=h><span class=b>see <a href="/x">lnk</a> here</span></p>',
        "br": "<p class=h><span>l1<br>l2</span></p>",
        "blockquote": "<blockquote><p class=h><span class=i>quoted</span></p></blockquote>",
        "auto_link": ('<p class=h><span>go <a href="https://a.test/x">'
                      "https://a.test/x</a> now</span></p>"),
        "titled_link": '<p class=h><a href="/r" title="T0">rel</a></p>',
        "img": '<p class=h>x <img src="/i.png" alt="pic"> y</p>',
        "hr": '<p class=h><span>a</span></p><hr><p class=h><span>b</span></p>',
        "full_doc": ("<html><head>{s}</head><body>"
                     '<h2><span>Sec</span></h2><p class=h><span class=i>lead </span>'
                     '<span class=b>big</span></p>'
                     '<ul class=x><li class=lst0><span>pt</span></li></ul>'
                     "</body></html>"),
        "table_plain": ('<table><tr><th>h1</th><th>h2</th></tr>'
                        "<tr><td>a</td><td>b</td></tr></table>"),
    }
    for name, body in fixtures.items():
        html = body.format(s=style) if "{s}" in body else style + body
        want, got = ref(html), html_to_markdown(html, base, google_doc=True)
        assert got == want, (name, repr(got), repr(want))
        if "strike" in name:
            want = ref(html, hide_strikethrough=True)
            got = html_to_markdown(html, base, google_doc=True, hide_strikethrough=True)
            assert got == want, (name, "hide", repr(got), repr(want))
