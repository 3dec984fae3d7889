"""LLM-strategy graft (operators/llm.py): transcription xchecks against
the reference's OWN extracted code, quirk pins, deterministic-fake
behavior, chunk/merge round-trips, and the Spark operators."""

import json
from collections import deque
from itertools import chain
from typing import Callable, Generator, Iterable, Sequence

import pytest

from crawl4ai_spark.operators import llm

from reference_loader import load_defs, load_method

EXTRA = {
    "json": json,
    "chain": chain,
    "deque": deque,
    "Callable": Callable,
    "Sequence": Sequence,
    "Iterable": Iterable,
    "Generator": Generator,
}


@pytest.fixture(scope="module")
def ref_utils():
    return load_defs(
        "utils.py",
        [
            "merge_chunks",
            "split_and_parse_json_objects",
            "sanitize_html",
            "sanitize_input_encode",
            "escape_json_string",
            "extract_xml_data",
        ],
        extra=EXTRA,
    )


MERGE_CASES = [
    (["one two three four five six seven eight nine ten"], 4, 0, 1.0),
    (["one two three four five six seven eight nine ten"], 4, 2, 1.0),
    (["a b c d e", "", "f g h i j k l m"], 5, 1, 1.0),
    (["lorem ipsum dolor sit amet " * 20], 16, 3, 1.3),
    (["x"], 10, 2, 1.0),
    ([], 10, 0, 1.0),
    (["many words here to chunk and then some more words"], 3, 5, 0.2),
]


def test_merge_chunks_matches_reference(ref_utils):
    for docs, target, overlap, ratio in MERGE_CASES:
        ours = llm.merge_chunks(docs, target, overlap=overlap, word_token_ratio=ratio)
        theirs = ref_utils["merge_chunks"](docs, target, overlap=overlap, word_token_ratio=ratio)
        assert ours == theirs, (docs, target, overlap, ratio)


def test_string_helpers_match_reference(ref_utils):
    tricky = [
        "",
        'He said "hi" and it\'s fine\nnew\tline\\path',
        "ctrl\x01char and del\x7f and nbsp-ish\x9f",
        "<blocks>[1]</blocks> junk <blocks>[1,2,3]</blocks>",
        "no tags at all",
    ]
    for s in tricky:
        assert llm.sanitize_html(s) == ref_utils["sanitize_html"](s)
        assert llm.escape_json_string(s) == ref_utils["escape_json_string"](s)
        assert llm.sanitize_input_encode(s) == ref_utils["sanitize_input_encode"](s)
        assert llm.extract_xml_data(["blocks", "x"], s) == ref_utils["extract_xml_data"](
            ["blocks", "x"], s
        )

    broken = '[{"a": 1}, {bad json}, {"b": {"c": 2}}]'
    assert llm.split_and_parse_json_objects(broken) == ref_utils["split_and_parse_json_objects"](
        broken
    )
    # nested braces keep depth-0 splitting honest
    nested = '{"a": {"b": 1}} trailing {"c": 3}'
    assert llm.split_and_parse_json_objects(nested) == ref_utils["split_and_parse_json_objects"](
        nested
    )


def test_prompt_substitution_order_quirk():
    """extraction_strategy.py:644-648: variables substitute sequentially
    in insertion order, so an HTML payload containing a later
    placeholder gets re-substituted — pinned."""
    p = llm.build_extract_prompt("u", "payload {REQUEST} end", instruction="INSTR")
    assert p.count("INSTR") == 2
    assert "{REQUEST}" not in p


def test_schema_without_instruction_leaves_request_slot():
    """Schema mode with no instruction never adds REQUEST to the
    variable map; the literal {REQUEST} slot survives in the prompt
    (reference quirk, extraction_strategy.py:630-641)."""
    p = llm.build_extract_prompt("u", "<p>x</p>", schema={"f": "str"}, extraction_type="schema")
    assert "{REQUEST}" in p and '"f": "str"' in p


def test_parse_blocks_force_json_unwrap_quirks():
    # single key whose value is a list -> that list
    blocks = llm.parse_blocks_response('{"news": [{"a": 1}]}', 0, True)
    assert blocks == [{"a": 1, "error": False}]
    # multi-key dict -> wrapped as one block
    blocks = llm.parse_blocks_response('{"a": 1, "b": 2}', 0, True)
    assert blocks == [{"a": 1, "b": 2, "error": False}]


def test_parse_blocks_fallback_error_block():
    """Unparsable payload falls back to depth-0 object splitting with
    the reference's index-0 error block (extraction_strategy.py:698-707)."""
    content = '<blocks>[{"index": 0, "tags": ["t"], "content": ["c"]}, {broken}]</blocks>'
    blocks = llm.parse_blocks_response(content, 3, False)
    assert blocks[0] == {"index": 0, "tags": ["t"], "content": ["c"]}
    assert blocks[-1]["error"] is True and blocks[-1]["tags"] == ["error"]


def test_completion_exception_yields_reference_error_block():
    def boom(prompt):
        raise RuntimeError("model down")

    rows = llm.extract_blocks_py("u", "<p>hello world</p>", boom)
    assert len(rows) == 1
    block = json.loads(rows[0][2])
    assert block["error"] is True and block["tags"] == ["error"] and "model down" in block["content"]
    assert block["index"] == 0  # section ix


def test_table_validate_and_ensure_match_reference():
    ref_validate = load_method("table_extraction.py", "LLMTableExtraction", "_validate_table_structure", extra=EXTRA)
    ref_ensure = load_method("table_extraction.py", "LLMTableExtraction", "_ensure_table_format", extra=EXTRA)
    cases = [
        {"headers": [["a", "b"]], "rows": [[["r1", "r2"]], ["x"]]},
        {"headers": ["a"], "rows": [["1", "2", "3"], ["1"]]},
        {"headers": [], "rows": [["1", "2"]]},
        {"headers": "bad", "rows": []},
        {"headers": ["a"], "rows": "bad"},
        {"headers": ["a", "b"], "rows": [["1"]], "metadata": {"row_count": 99}},
    ]
    for case in cases:
        import copy

        ours_t, ref_t = copy.deepcopy(case), copy.deepcopy(case)
        ok_ours = llm.validate_table_structure(ours_t)
        ok_ref = ref_validate(None, ref_t)
        assert ok_ours == ok_ref, case
        assert ours_t == ref_t  # in-place flattening parity
        if ok_ours:
            assert llm.ensure_table_format(ours_t) == ref_ensure(None, ref_t)


def test_table_merge_matches_reference():
    ref_merge = load_method("table_extraction.py", "LLMTableExtraction", "_merge_chunk_results", extra=EXTRA)
    results = [
        {"chunk_index": 1, "table": {"headers": ["h"], "rows": [["b"]], "caption": "", "summary": "", "metadata": {"row_count": 1}}},
        {"chunk_index": 0, "table": {"headers": ["h"], "rows": [["a"]], "caption": "c", "summary": "", "metadata": {"row_count": 1}}},
        {"chunk_index": 2, "table": None},
    ]
    import copy

    class _Quiet:
        verbose = False

    ours = llm.merge_table_chunks(copy.deepcopy(results))
    theirs = ref_merge(_Quiet(), copy.deepcopy(results))
    assert ours == theirs
    assert ours[0]["rows"] == [["a"], ["b"]] and ours[0]["metadata"]["chunk_count"] == 2


def test_chunk_html_assembly_matches_reference():
    ref_chunk = load_method("table_extraction.py", "LLMTableExtraction", "_create_chunk_html", extra=EXTRA)
    for hdr, rows, foot in [
        ("<thead><tr><th>h</th></tr></thead>", ["<tr><td>1</td></tr>"], None),
        ("", ["<tr><td>1</td></tr>", "<tr><td>2</td></tr>"], "<tfoot><tr><td>f</td></tr></tfoot>"),
    ]:
        assert llm._create_chunk_html(hdr, rows, foot) == ref_chunk(None, hdr, rows, foot)


def _big_table(n_rows: int, caption: str = "Cap") -> str:
    return (
        f'<table summary="sum"><caption>{caption}</caption>'
        "<thead><tr><th>id</th><th colspan=\"2\">pair</th></tr></thead><tbody>"
        + "".join(
            f'<tr><td>r{i}</td><td colspan="2">wide{i}</td></tr>'
            if i % 5 == 0
            else f"<tr><td>r{i}</td><td>a{i}</td><td>b{i}</td></tr>"
            for i in range(n_rows)
        )
        + "</tbody></table>"
    )


def test_table_chunked_equals_unchunked():
    """Chunked extraction (headers repeated per chunk, rows merged)
    reproduces the single-shot extraction for colspan tables — the
    correctness contract of the smart chunker."""
    html = _big_table(30)
    whole = llm.extract_tables_py(html, llm.fake_table_completion, enable_chunking=False)
    chunked = llm.extract_tables_py(html, llm.fake_table_completion, chunk_token_threshold=80)
    assert chunked[0]["metadata"]["chunk_count"] > 2
    assert whole[0]["rows"] == chunked[0]["rows"]
    assert whole[0]["headers"] == chunked[0]["headers"]
    # reference quirk, pinned: _create_chunk_html (table_extraction.py:
    # 1058-1076) rebuilds chunks from header+rows only, so the chunked
    # path DROPS the caption/summary the single-shot path preserves
    assert whole[0]["caption"] == "Cap" and chunked[0]["caption"] == ""


def test_table_rowspan_expansion():
    html = (
        "<table><tr><th>grp</th><th>v</th></tr>"
        '<tr><td rowspan="3">G</td><td>1</td></tr>'
        "<tr><td>2</td></tr><tr><td>3</td></tr></table>"
    )
    out = llm.extract_tables_py(html, llm.fake_table_completion, enable_chunking=False)
    assert out[0]["rows"] == [["G", "1"], ["G", "2"], ["G", "3"]]
    assert out[0]["metadata"]["has_merged_cells"] is True


def test_no_headers_table_directive():
    html = "<table>" + "".join(f"<tr><td>x{i}</td><td>y{i}</td></tr>" for i in range(40)) + "</table>"
    out = llm.extract_tables_py(html, llm.fake_table_completion, chunk_token_threshold=60)
    assert out[0]["headers"] == []
    assert len(out[0]["rows"]) == 40  # all rows across chunks, no header rows eaten


def test_no_table_short_circuit():
    assert llm.extract_tables_py("<div>nope</div>", llm.fake_table_completion) == []


def test_spark_operators_match_pure_python(spark):
    pages = [
        ("u1", '<h1>Hi</h1><p>alpha beta gamma delta epsilon zeta eta theta</p><p>more text here</p>'),
        ("u2", "<p>it's \"quoted\" content</p>"),
    ]
    df = spark.createDataFrame(pages, ["url", "html"])

    out = llm.llm_extract_blocks(df, llm.fake_block_completion, chunk_token_threshold=10).collect()
    expected = {
        (u, six, pos, bj)
        for u, h in pages
        for six, pos, bj in llm.extract_blocks_py(u, h, llm.fake_block_completion, chunk_token_threshold=10)
    }
    assert {(r.url, r.section_ix, r.block_pos, r.block_json) for r in out} == expected
    assert len(out) == len(expected)

    md = llm.llm_filter_markdown(df, llm.fake_filter_completion).collect()
    exp_md = {
        (u, i, m)
        for u, h in pages
        for i, m in enumerate(llm.filter_content_py(h, llm.fake_filter_completion))
    }
    assert {(r.url, r.chunk_ix, r.markdown) for r in md} == exp_md

    tdf = spark.createDataFrame([("t1", _big_table(30)), ("t2", "<p>none</p>")], ["table_id", "html"])
    tout = llm.llm_extract_tables(tdf, llm.fake_table_completion, chunk_token_threshold=80).collect()
    exp_table = llm.extract_tables_py(_big_table(30), llm.fake_table_completion, chunk_token_threshold=80)[0]
    assert {r.table_id for r in tout} == {"t1"}
    assert sorted((r.row_idx, json.loads(r.row_json)) for r in tout) == list(
        enumerate(exp_table["rows"])
    )
    assert all(r.chunk_count == exp_table["metadata"]["chunk_count"] for r in tout)
