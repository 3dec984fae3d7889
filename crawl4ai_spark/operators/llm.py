"""LLM-strategy grafts: LLMExtractionStrategy / LLMContentFilter /
LLMTableExtraction analogs with a pluggable completion function.

The reference drives three strategies through an LLM endpoint
(``perform_completion_with_backoff``).  No model runtime exists in this
sandbox, so — per the multimodal-stub pattern — the MODEL CALL is a
pluggable ``completion_fn: str -> str`` and everything around it is the
real, reference-parity data plane:

* chunk math: ``merge_chunks`` word-budget packing with overlap
  (utils.py:162-230), the table plane's header-preserving row chunker
  (table_extraction.py:987-1074), token estimate ``len//4``
  (table_extraction.py:895-909, the non-tiktoken path);
* prompt assembly: template choice + sequential ``{VAR}`` substitution
  (extraction_strategy.py:620-648) over the same variable slots
  (URL / HTML / REQUEST / SCHEMA).  The PROMPT TEXT ITSELF is our own
  wording — it is model-facing copy, not data semantics, and is
  deliberately not copied from the reference's prompts.py;
* payload encoding: ``sanitize_html`` quote-escaping (utils.py:752),
  ``escape_json_string`` (utils.py:795), ``sanitize_input_encode``
  (utils.py:777);
* response parsing/repair: longest-``<tag>`` extraction
  (``extract_xml_data``, utils.py:1709), JSON-object splitting for
  broken responses (``split_and_parse_json_objects``, utils.py:707),
  the force-json dict-unwrapping quirks (extraction_strategy.py:678-696),
  the error-block shapes (extraction_strategy.py:698-729), the table
  wrapper-key unwrap / nested-list flatten / validate / pad-truncate
  (table_extraction.py:1139-1177,1310-1445) and chunk merge
  (table_extraction.py:1178-1212);
* distribution: one stateless Arrow-batched ``mapInPandas`` per
  operator — at 100 TB each page/table is an independent row and the
  "LLM" stage is embarrassingly parallel (on a real deployment the
  completion_fn is an RPC to a serving tier; Spark's job is batching,
  retry bookkeeping and the deterministic pre/post processing, which is
  exactly what is implemented and tested here).

The default fakes are DETERMINISTIC and disclosed: they recover the
HTML payload embedded in the prompt and run real parsers over it
(``fake_block_completion`` segments the DOM, ``fake_table_completion``
expands rowspan/colspan into a rectangular grid — the very ability the
reference rents an LLM for — and ``fake_filter_completion`` emits
markdown via the real generator), which makes every operator oracle-
checkable end-to-end while keeping the honest "no model runtime" scope
of r2's VERDICT ❌ rows.
"""

from __future__ import annotations

import json
import re
from array import array
from itertools import chain
from typing import Callable, Iterator, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.dom import DomNode, parse_dom

# config.py:42-44
CHUNK_TOKEN_THRESHOLD = 2 ** 11
OVERLAP_RATE = 0.1
WORD_TOKEN_RATE = 1.3

CompletionFn = Callable[[str], str]


# ---------------------------------------------------------------------------
# utils transcriptions (cited per function; xchecked in tests/test_llm.py)
# ---------------------------------------------------------------------------

def merge_chunks(
    docs: Sequence[str],
    target_size: int,
    overlap: int = 0,
    word_token_ratio: float = 1.0,
    splitter: Callable = None,
) -> List[str]:
    """utils.py:162-230 exact: whitespace-tokenize every doc, scale the
    count by ``word_token_ratio``, pre-allocate ``ceil(total/target)``
    chunks and pack tokens left to right; when a chunk fills, its last
    ``overlap`` tokens are replayed into the next chunk.  Quirks pinned:
    the fill check counts RAW tokens (``curr_size += 1``) while chunk
    COUNT uses the scaled estimate, and the last chunk absorbs any
    excess."""
    splitter = splitter or str.split
    token_counts = array("I")
    all_tokens: List[List[str]] = []
    total_tokens = 0

    for doc in docs:
        tokens = splitter(doc)
        count = int(len(tokens) * word_token_ratio)
        if count:  # skip empty docs
            token_counts.append(count)
            all_tokens.append(tokens)
            total_tokens += count

    if not total_tokens:
        return []

    num_chunks = max(1, (total_tokens + target_size - 1) // target_size)
    chunks: List[List[str]] = [[] for _ in range(num_chunks)]

    curr_chunk = 0
    curr_size = 0

    for tok in chain.from_iterable(all_tokens):
        if curr_size >= target_size and curr_chunk < num_chunks - 1:
            if overlap > 0:
                overlap_tokens = chunks[curr_chunk][-overlap:]
                curr_chunk += 1
                chunks[curr_chunk].extend(overlap_tokens)
                curr_size = len(overlap_tokens)
            else:
                curr_chunk += 1
                curr_size = 0
        chunks[curr_chunk].append(tok)
        curr_size += 1

    return [" ".join(c) for c in chunks if c]


def split_and_parse_json_objects(json_string: str):
    """utils.py:707-750 exact: strip a ``[...]`` wrapper, scan for
    depth-0 ``{...}`` segments, json-parse each; returns (parsed,
    unparsed-segment-strings)."""
    if json_string.startswith("[") and json_string.endswith("]"):
        json_string = json_string[1:-1].strip()

    segments = []
    depth = 0
    start_index = 0
    for i, char in enumerate(json_string):
        if char == "{":
            if depth == 0:
                start_index = i
            depth += 1
        elif char == "}":
            depth -= 1
            if depth == 0:
                segments.append(json_string[start_index : i + 1])

    parsed_objects, unparsed_segments = [], []
    for segment in segments:
        try:
            parsed_objects.append(json.loads(segment))
        except json.JSONDecodeError:
            unparsed_segments.append(segment)
    return parsed_objects, unparsed_segments


def sanitize_html(html: str) -> str:
    """utils.py:752-775 exact (the active lines): backslash-escape
    double AND single quotes; nothing else."""
    return html.replace('"', '\\"').replace("'", "\\'")


def sanitize_input_encode(text: str) -> str:
    """utils.py:777-793: utf-8 encode/decode with errors ignored."""
    if not text:
        return ""
    return text.encode("utf-8", errors="ignore").decode("utf-8")


def escape_json_string(s: str) -> str:
    """utils.py:795-820 exact order: backslash first, then quote,
    then named control escapes, then the \\u escape sweep."""
    s = s.replace("\\", "\\\\")
    s = s.replace('"', '\\"')
    s = s.replace("\b", "\\b")
    s = s.replace("\f", "\\f")
    s = s.replace("\n", "\\n")
    s = s.replace("\r", "\\r")
    s = s.replace("\t", "\\t")
    s = re.sub(r"[\x00-\x1f\x7f-\x9f]", lambda x: "\\u{:04x}".format(ord(x.group())), s)
    return s


def extract_xml_data(tags: Sequence[str], string: str) -> dict:
    """utils.py:1709-1740 exact: for each tag take the LONGEST
    ``<tag>...</tag>`` match (DOTALL), stripped; '' when absent."""
    data = {}
    for tag in tags:
        matches = re.findall(f"<{tag}>(.*?)</{tag}>", string, re.DOTALL)
        data[tag] = max(matches, key=len).strip() if matches else ""
    return data


# ---------------------------------------------------------------------------
# prompt assembly — same slots/wrappers as prompts.py, OWN wording
# ---------------------------------------------------------------------------

PROMPT_EXTRACT_BLOCKS = """Webpage URL:
<url>{URL}</url>

Cleaned HTML of the page:
<html>
{HTML}
</html>

Segment this HTML into semantically coherent blocks. For every block emit a
JSON object with keys: index (integer position), tags (a list with ONE
semantic label), content (list of strings, text copied verbatim).
Answer with a complete parsable JSON array wrapped in <blocks> tags:

<blocks>
[{"index": 0, "tags": ["example"], "content": ["..."]}]
</blocks>"""

PROMPT_EXTRACT_BLOCKS_WITH_INSTRUCTION = """Webpage URL:
<url>{URL}</url>

Cleaned HTML of the page:
<html>
{HTML}
</html>

Apply this instruction while segmenting the HTML into blocks:
<request>{REQUEST}</request>

Emit a JSON array of objects with keys index, tags, content, wrapped in
<blocks> tags:

<blocks>
[{"index": 0, "tags": ["example"], "content": ["..."]}]
</blocks>"""

PROMPT_EXTRACT_SCHEMA_WITH_INSTRUCTION = """Content from {URL}:
<content>
{HTML}
</content>

Extract objects matching this JSON schema:
<schema>
{SCHEMA}
</schema>

Extraction instruction:
<request>{REQUEST}</request>

Return ONLY a JSON array of schema-conformant objects."""

PROMPT_EXTRACT_INFERRED_SCHEMA = """Content from {URL}:
<content>
{HTML}
</content>

Infer the natural record schema of this content and return a JSON array of
records following it. Return ONLY the JSON array."""

PROMPT_FILTER_CONTENT = """Convert this HTML fragment into clean, focused
markdown, dropping navigation chrome and noise:

<html>
{HTML}
</html>

Follow this guidance:
<request>{REQUEST}</request>

Answer with the markdown wrapped in <content> tags."""

DEFAULT_FILTER_INSTRUCTION = (
    "Convert this HTML into clean, relevant markdown, removing any noise "
    "or irrelevant content."
)


def build_extract_prompt(
    url: str,
    html: str,
    instruction: Optional[str] = None,
    schema: Optional[dict] = None,
    extraction_type: str = "block",
) -> str:
    """Template choice + substitution, extraction_strategy.py:620-648
    exact: variables substituted SEQUENTIALLY in insertion order
    (URL, HTML, then REQUEST/SCHEMA) via str.replace — a value
    containing a later placeholder gets re-substituted (pinned in
    tests); schema mode WITHOUT an instruction leaves the literal
    ``{REQUEST}`` slot in the prompt (reference quirk)."""
    variable_values = {"URL": url, "HTML": escape_json_string(sanitize_html(html))}
    prompt = PROMPT_EXTRACT_BLOCKS
    if instruction:
        variable_values["REQUEST"] = instruction
        prompt = PROMPT_EXTRACT_BLOCKS_WITH_INSTRUCTION
    if extraction_type == "schema" and schema:
        variable_values["SCHEMA"] = json.dumps(schema, indent=2)
        prompt = PROMPT_EXTRACT_SCHEMA_WITH_INSTRUCTION
    if extraction_type == "schema" and not schema:
        prompt = PROMPT_EXTRACT_INFERRED_SCHEMA
    for variable in variable_values:
        prompt = prompt.replace("{" + variable + "}", variable_values[variable])
    return prompt


def parse_blocks_response(content: str, ix: int, force_json: bool) -> List[dict]:
    """extraction_strategy.py:678-729 exact: force-json path unwraps a
    single-list-valued dict (or wraps a bare dict); otherwise the
    longest <blocks> payload is json-parsed; every good block gains
    ``error: False``; any failure falls back to depth-0 JSON-object
    splitting, with unparsed residue appended as an index-0 error
    block."""
    try:
        if force_json:
            blocks = json.loads(content)
            if isinstance(blocks, dict):
                if len(blocks) == 1 and isinstance(list(blocks.values())[0], list):
                    blocks = list(blocks.values())[0]
                else:
                    blocks = [blocks]
        else:
            blocks = json.loads(extract_xml_data(["blocks"], content)["blocks"])
        for block in blocks:
            block["error"] = False
        return blocks
    except Exception:
        parsed, unparsed = split_and_parse_json_objects(content)
        blocks = parsed
        if unparsed:
            blocks.append(
                {"index": 0, "error": True, "tags": ["error"], "content": unparsed}
            )
        return blocks


def extract_blocks_py(
    url: str,
    content: str,
    completion_fn: CompletionFn,
    instruction: Optional[str] = None,
    schema: Optional[dict] = None,
    extraction_type: str = "block",
    force_json_response: bool = False,
    chunk_token_threshold: int = CHUNK_TOKEN_THRESHOLD,
    overlap_rate: float = OVERLAP_RATE,
    word_token_rate: float = WORD_TOKEN_RATE,
    apply_chunking: bool = True,
) -> List[tuple]:
    """LLMExtractionStrategy.run analog for ONE page (extraction_
    strategy.py:743-790, sequential): merge_chunks the content, build a
    prompt per section (``sanitize_input_encode`` applied, :767), call
    the model, parse.  A completion exception yields the reference's
    single error block for that section (:718-729).  Returns
    [(section_ix, block_pos, block_json)] with sort_keys-canonical
    JSON."""
    if not apply_chunking:
        chunk_token_threshold = int(1e9)
    sections = merge_chunks(
        [content],
        chunk_token_threshold,
        overlap=int(chunk_token_threshold * overlap_rate),
        word_token_ratio=word_token_rate,
    )
    out = []
    for ix, section in enumerate(sections):
        prompt = build_extract_prompt(
            url, sanitize_input_encode(section), instruction, schema, extraction_type
        )
        try:
            blocks = parse_blocks_response(completion_fn(prompt), ix, force_json_response)
        except Exception as e:  # the reference's outer catch (:718)
            blocks = [{"index": ix, "error": True, "tags": ["error"], "content": str(e)}]
        for pos, block in enumerate(blocks):
            out.append((ix, pos, json.dumps(block, sort_keys=True)))
    return out


BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("section_ix", T.LongType()),
        T.StructField("block_pos", T.LongType()),
        T.StructField("block_json", T.StringType()),
    ]
)


def llm_extract_blocks(
    pages: DataFrame,
    completion_fn: CompletionFn,
    url_col: str = "url",
    content_col: str = "html",
    **kw,
) -> DataFrame:
    """Distributed LLMExtractionStrategy: one Arrow batch → many pages,
    each chunked + prompted + parsed independently (no shuffle; the
    completion call is the parallel unit exactly as the reference's
    ThreadPoolExecutor, but scaled across executors)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, content in zip(pdf[url_col], pdf[content_col]):
                for six, pos, bj in extract_blocks_py(url, content or "", completion_fn, **kw):
                    rows.append((url, six, pos, bj))
            yield pd.DataFrame(rows, columns=["url", "section_ix", "block_pos", "block_json"])

    return pages.select(url_col, content_col).mapInPandas(gen, BLOCKS_SCHEMA)


# ---------------------------------------------------------------------------
# LLMContentFilter analog (content_filter_strategy.py:780-1063)
# ---------------------------------------------------------------------------

def filter_content_py(
    html: str,
    completion_fn: CompletionFn,
    instruction: Optional[str] = None,
    chunk_token_threshold: int = int(1e9),
    overlap_rate: float = OVERLAP_RATE,
    word_token_rate: float = WORD_TOKEN_RATE,
) -> List[str]:
    """filter_content analog: merge_chunks the html (:885-895, default
    threshold 1e9 = one chunk), per-chunk PROMPT_FILTER_CONTENT with
    the default instruction fallback (:956-958), collect the longest
    <content> payload per chunk IN ORDER; empty payloads and completion
    errors drop the chunk (:1028-1043)."""
    if not html or not isinstance(html, str):
        return []
    chunks = merge_chunks(
        [html],
        chunk_token_threshold,
        overlap=int(chunk_token_threshold * overlap_rate),
        word_token_ratio=word_token_rate,
    )
    ordered_results = []
    for chunk in chunks:
        prompt = PROMPT_FILTER_CONTENT
        for var, value in {
            "HTML": escape_json_string(sanitize_html(chunk)),
            "REQUEST": instruction or DEFAULT_FILTER_INSTRUCTION,
        }.items():
            prompt = prompt.replace("{" + var + "}", value)
        try:
            blocks = extract_xml_data(["content"], completion_fn(prompt))["content"]
        except Exception:
            continue
        if blocks:
            ordered_results.append(blocks)
    return ordered_results


FILTER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("chunk_ix", T.LongType()),
        T.StructField("markdown", T.StringType()),
    ]
)


def llm_filter_markdown(
    pages: DataFrame,
    completion_fn: CompletionFn,
    url_col: str = "url",
    content_col: str = "html",
    **kw,
) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, content in zip(pdf[url_col], pdf[content_col]):
                for i, md in enumerate(filter_content_py(content or "", completion_fn, **kw)):
                    rows.append((url, i, md))
            yield pd.DataFrame(rows, columns=["url", "chunk_ix", "markdown"])

    return pages.select(url_col, content_col).mapInPandas(gen, FILTER_SCHEMA)


# ---------------------------------------------------------------------------
# LLMTableExtraction analog (table_extraction.py:320-1445)
# ---------------------------------------------------------------------------

def estimate_tokens(text: str) -> int:
    """table_extraction.py:895-909, the non-tiktoken fallback: 1 token
    ≈ 4 characters (tiktoken is absent in this sandbox, which is also
    the reference's own behavior without it)."""
    return len(text) // 4


def _direct_trs(scope: DomNode) -> List[DomNode]:
    """All descendant <tr> in document order (lxml ``.//tr`` parity —
    nested tables' rows INCLUDED; pinned)."""
    return scope.find_all("tr")


def table_structure(html: str):
    """_extract_table_structure (table_extraction.py:926-985): first
    table only; headers from <thead> else the PREFIX of rows containing
    a <th> (loop breaks at the first non-th row); footer from <tfoot>;
    body from <tbody> else positional slice; the no-headers-no-tbody
    fallback reassigns body to ALL rows.  Returns (header_rows,
    body_rows, footer_rows, has_headers) as DomNodes."""
    root = parse_dom(html)
    tables = root.find_all("table")
    if not tables:
        return [], [], [], False
    table = tables[0]

    header_rows: List[DomNode] = []
    thead = table.find_all("thead")
    if thead:
        header_rows = _direct_trs(thead[0])
    else:
        for row in _direct_trs(table):
            if row.find_all("th"):
                header_rows.append(row)
            else:
                break
    has_headers = len(header_rows) > 0

    footer_rows: List[DomNode] = []
    tfoot = table.find_all("tfoot")
    if tfoot:
        footer_rows = _direct_trs(tfoot[0])

    tbody = table.find_all("tbody")
    if tbody:
        body_rows = _direct_trs(tbody[0])
    else:
        all_rows = _direct_trs(table)
        header_count, footer_count = len(header_rows), len(footer_rows)
        if footer_count > 0:
            body_rows = all_rows[header_count:-footer_count]
        else:
            body_rows = all_rows[header_count:]
    if not has_headers and not tbody:
        body_rows = _direct_trs(tables[0])

    return header_rows, body_rows, footer_rows, has_headers


def _create_chunk_html(header_html: str, body_rows: List[str], footer_html: Optional[str]) -> str:
    """table_extraction.py:1058-1076 exact assembly."""
    parts = ["<table>"]
    if header_html:
        parts.append(header_html)
    parts.append("<tbody>")
    parts.extend(body_rows)
    parts.append("</tbody>")
    if footer_html:
        parts.append(footer_html)
    parts.append("</table>")
    return "".join(parts)


def create_smart_chunks(html: str, chunk_token_threshold: int):
    """_create_smart_chunks (table_extraction.py:987-1056): the header
    html is REPEATED in every chunk and charged against each chunk's
    budget; the footer rides only in the last chunk; a chunk closes
    when the NEXT row would overflow (first row always admitted).
    ``_rebalance_chunks`` is the reference's no-op (:1078-1085) —
    pinned as such."""
    header_rows, body_rows, footer_rows, has_headers = table_structure(html)
    if not body_rows:
        return [html], has_headers

    header_html = ""
    if header_rows:
        header_html = "<thead>" + "".join(r.outer_html() for r in header_rows) + "</thead>"

    chunks: List[str] = []
    current_chunk_rows: List[str] = []
    current_token_count = estimate_tokens(header_html)
    for row in body_rows:
        row_html = row.outer_html()
        row_tokens = estimate_tokens(row_html)
        if current_chunk_rows and (current_token_count + row_tokens > chunk_token_threshold):
            chunks.append(_create_chunk_html(header_html, current_chunk_rows, None))
            current_chunk_rows = [row_html]
            current_token_count = estimate_tokens(header_html) + row_tokens
        else:
            current_chunk_rows.append(row_html)
            current_token_count += row_tokens

    if current_chunk_rows:
        footer_html = None
        if footer_rows:
            footer_html = "<tfoot>" + "".join(r.outer_html() for r in footer_rows) + "</tfoot>"
        chunks.append(_create_chunk_html(header_html, current_chunk_rows, footer_html))
    return chunks, has_headers


NO_HEADERS_CONTEXT = (
    "\nIMPORTANT: This table has NO headers. Return an empty array for the "
    "'headers' field and extract all rows as data rows."
)


def build_table_chunk_prompt(chunk_html: str, chunk_index: int, total_chunks: int, has_headers: bool) -> str:
    """_process_chunk prompt shape (table_extraction.py:1097-1112):
    part x-of-y context, optional no-headers directive, the chunk
    embedded ``sanitize_html``-escaped in an ```html fence."""
    header_context = "" if has_headers else NO_HEADERS_CONTEXT
    return (
        f"Extract the table data from this HTML chunk.\n"
        f"This is part {chunk_index + 1} of {total_chunks} of a larger table.\n"
        f"Extract the data rows exactly.{header_context}\n\n"
        f"```html\n{sanitize_html(chunk_html)}\n```\n\n"
        f"Return only a JSON array of extracted tables in the specified format."
    )


def validate_table_structure(table) -> bool:
    """_validate_table_structure (table_extraction.py:1310-1357) exact,
    including the in-place single-element-nest flattening of headers
    and rows."""
    if not isinstance(table, dict):
        return False
    headers = table.get("headers")
    if not isinstance(headers, list):
        return False
    while isinstance(headers, list) and len(headers) == 1 and isinstance(headers[0], list):
        table["headers"] = headers[0]
        headers = table["headers"]
    rows = table.get("rows")
    if not isinstance(rows, list):
        return False
    cleaned_rows = []
    for row in rows:
        while isinstance(row, list) and len(row) == 1 and isinstance(row[0], list):
            row = row[0]
        cleaned_rows.append(row)
    table["rows"] = cleaned_rows
    for row in table.get("rows", []):
        if not isinstance(row, list):
            return False
    return True


def ensure_table_format(table: dict) -> dict:
    """_ensure_table_format (table_extraction.py:1359-1445) exact:
    defaults, derived metadata, rows padded with '' / truncated to the
    header width (only when headers exist)."""
    formatted = {
        "headers": table.get("headers", []),
        "rows": table.get("rows", []),
        "caption": table.get("caption", ""),
        "summary": table.get("summary", ""),
        "metadata": table.get("metadata", {}),
    }
    if not formatted["metadata"]:
        formatted["metadata"] = {}
    metadata = formatted["metadata"]
    if "row_count" not in metadata:
        metadata["row_count"] = len(formatted["rows"])
    if "column_count" not in metadata:
        metadata["column_count"] = len(formatted["headers"])
    if "has_headers" not in metadata:
        metadata["has_headers"] = bool(formatted["headers"])
    col_count = len(formatted["headers"])
    if col_count > 0:
        for i, row in enumerate(formatted["rows"]):
            if len(row) < col_count:
                formatted["rows"][i] = row + [""] * (col_count - len(row))
            elif len(row) > col_count:
                formatted["rows"][i] = row[:col_count]
    return formatted


def _unwrap_tables_payload(tables_data):
    """Response-format tolerance (table_extraction.py:818-837 /
    1139-1154): unwrap result/tables/data keys, wrap a bare table
    dict, flatten single-element nested lists."""
    if isinstance(tables_data, dict):
        if "result" in tables_data:
            tables_data = tables_data["result"]
        elif "tables" in tables_data:
            tables_data = tables_data["tables"]
        elif "data" in tables_data:
            tables_data = tables_data["data"]
        else:
            tables_data = [tables_data]
    while isinstance(tables_data, list) and len(tables_data) == 1 and isinstance(tables_data[0], list):
        tables_data = tables_data[0]
    if not isinstance(tables_data, list):
        tables_data = [tables_data]
    return tables_data


def process_table_chunk(chunk_html, chunk_index, total_chunks, has_headers, completion_fn):
    """_process_chunk (table_extraction.py:1087-1176): first VALID
    table in the response wins; parse/validation failure or a
    completion error yields table=None for the chunk."""
    prompt = build_table_chunk_prompt(chunk_html, chunk_index, total_chunks, has_headers)
    try:
        tables_data = _unwrap_tables_payload(json.loads(completion_fn(prompt)))
        for table in tables_data:
            if validate_table_structure(table):
                return {"chunk_index": chunk_index, "table": ensure_table_format(table)}
        return {"chunk_index": chunk_index, "table": None}
    except Exception as e:
        return {"chunk_index": chunk_index, "table": None, "error": str(e)}


def merge_table_chunks(chunk_results: List[dict]) -> List[dict]:
    """_merge_chunk_results (table_extraction.py:1178-1212) exact:
    order by chunk_index, drop failed chunks, first chunk donates the
    structure, rows concatenate, metadata gains chunked/chunk_count."""
    chunk_results.sort(key=lambda x: x.get("chunk_index", 0))
    valid_chunks = [r for r in chunk_results if r.get("table")]
    if not valid_chunks:
        return []
    merged_table = valid_chunks[0]["table"].copy()
    all_rows = []
    for chunk_result in valid_chunks:
        all_rows.extend(chunk_result["table"].get("rows", []))
    merged_table["rows"] = all_rows
    merged_table["metadata"]["row_count"] = len(all_rows)
    merged_table["metadata"]["chunked"] = True
    merged_table["metadata"]["chunk_count"] = len(valid_chunks)
    return [merged_table]


def extract_tables_py(
    html: str,
    completion_fn: CompletionFn,
    enable_chunking: bool = True,
    chunk_token_threshold: int = 3000,
) -> List[dict]:
    """LLMTableExtraction.extract_tables analog for one html fragment
    (:733-837 + :1214-1262, sequential — the ThreadPool fan-out is
    Spark's job here): no-table short-circuit, chunk when the token
    estimate exceeds the threshold, else a single whole-table call."""
    if "<table" not in html.lower():
        return []
    if enable_chunking and estimate_tokens(html) > chunk_token_threshold:
        chunks, has_headers = create_smart_chunks(html, chunk_token_threshold)
        if len(chunks) == 1:
            result = process_table_chunk(chunks[0], 0, 1, has_headers, completion_fn)
            return [result["table"]] if result.get("table") else []
        chunk_results = [
            process_table_chunk(c, i, len(chunks), has_headers, completion_fn)
            for i, c in enumerate(chunks)
        ]
        return merge_table_chunks(chunk_results)
    result = process_table_chunk(html, 0, 1, True, completion_fn)
    return [result["table"]] if result.get("table") else []


TABLE_SCHEMA = T.StructType(
    [
        T.StructField("table_id", T.StringType()),
        T.StructField("headers_json", T.StringType()),
        T.StructField("row_idx", T.LongType()),
        T.StructField("row_json", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("chunk_count", T.LongType()),
        T.StructField("row_count", T.LongType()),
    ]
)


def llm_extract_tables(
    tables: DataFrame,
    completion_fn: CompletionFn,
    id_col: str = "table_id",
    html_col: str = "html",
    **kw,
) -> DataFrame:
    """Distributed LLMTableExtraction: one row per (table, data-row)
    after chunked extraction + merge.  chunk_count is 1 for unchunked
    tables (the reference only stamps ``chunk_count`` metadata on the
    merged path — normalized here for a stable column)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tid, html in zip(pdf[id_col], pdf[html_col]):
                for t in extract_tables_py(html or "", completion_fn, **kw):
                    hdr = json.dumps(t["headers"])
                    cc = int(t["metadata"].get("chunk_count", 1))
                    rc = int(t["metadata"]["row_count"])
                    for i, row in enumerate(t["rows"]):
                        rows.append((tid, hdr, i, json.dumps(row), t["caption"], cc, rc))
            yield pd.DataFrame(
                rows,
                columns=[
                    "table_id", "headers_json", "row_idx", "row_json",
                    "caption", "chunk_count", "row_count",
                ],
            )

    return tables.select(id_col, html_col).mapInPandas(gen, TABLE_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic completion fakes (disclosed; no model runtime in sandbox)
# ---------------------------------------------------------------------------

def _unescape_payload(s: str) -> str:
    """Invert escape_json_string (it IS json string escaping) then
    sanitize_html's quote-backslashing — recovering the original HTML
    the caller embedded in the prompt."""
    try:
        s = json.loads('"' + s + '"')
    except Exception:
        pass
    return s.replace('\\"', '"').replace("\\'", "'")


def _payload_between(prompt: str, open_tag: str, close_tag: str) -> str:
    m = re.findall(f"{open_tag}\n(.*?)\n{close_tag}", prompt, re.DOTALL)
    return _unescape_payload(max(m, key=len)) if m else ""


def fake_block_completion(prompt: str) -> str:
    """Deterministic stand-in for the block-extraction model: reads the
    <html> payload back out of the prompt and segments the DOM — every
    element child of <body> becomes one block with its tag as the
    semantic label and its whitespace-joined text as content."""
    html = _payload_between(prompt, "<html>", "</html>")
    root = parse_dom(html)
    body = root.find("body") or root
    blocks = []
    for i, el in enumerate(body.element_children()):
        text = " ".join(el.get_text(separator=" ", strip=True).split())
        blocks.append({"index": i, "tags": [el.tag], "content": [text]})
    return "<blocks>\n" + json.dumps(blocks) + "\n</blocks>"


def fake_filter_completion(prompt: str) -> str:
    """Deterministic stand-in for the markdown-filter model: real
    markdown generation (functions/markdown.py) over the recovered
    HTML payload."""
    from ..functions.markdown import generate_markdown

    html = _payload_between(prompt, "<html>", "</html>")
    md = generate_markdown(html, base_url="https://fake.model/")["raw_markdown"]
    return "<content>\n" + md + "\n</content>"


def _grid_expand(trs: List[DomNode]):
    """Rowspan+colspan expansion into a rectangular grid — the very
    capability the reference rents an LLM for (its prompt's merged-cell
    contract, table_extraction.py:383-420): colspan duplicates a value
    across columns, rowspan carries it down subsequent rows."""
    grid: List[List[str]] = []
    carry: dict = {}  # col -> (remaining_rows, value)
    merged = False
    for tr in trs:
        row: List[str] = []
        col = 0

        def _fill_carry():
            nonlocal col
            while col in carry and carry[col][0] > 0:
                rem, val = carry[col]
                row.append(val)
                carry[col] = (rem - 1, val)
                if carry[col][0] == 0:
                    del carry[col]
                col += 1

        _fill_carry()
        for cell in [c for c in tr.element_children() if c.tag in ("td", "th")]:
            text = " ".join(cell.get_text(separator=" ", strip=True).split())
            try:
                colspan = max(1, int(cell.get("colspan", 1)))
            except (TypeError, ValueError):
                colspan = 1
            try:
                rowspan = max(1, int(cell.get("rowspan", 1)))
            except (TypeError, ValueError):
                rowspan = 1
            if colspan > 1 or rowspan > 1:
                merged = True
            for _ in range(colspan):
                row.append(text)
                if rowspan > 1:
                    carry[col] = (rowspan - 1, text)
                col += 1
                _fill_carry()
        grid.append(row)
    return grid, merged


def fake_table_completion(prompt: str) -> str:
    """Deterministic stand-in for the table-extraction model: recovers
    the ```html fenced chunk, expands rowspan/colspan into a grid, and
    answers the reference's JSON contract (headers = last expanded
    header row; the prompt's no-headers directive is honored)."""
    m = re.findall("```html\n(.*?)\n```", prompt, re.DOTALL)
    html = _unescape_payload(max(m, key=len)) if m else ""
    no_headers = "NO headers" in prompt
    header_rows, body_rows, footer_rows, _ = table_structure(html)

    hdr_grid, hdr_merged = _grid_expand(header_rows)
    headers = [] if no_headers else (hdr_grid[-1] if hdr_grid else [])
    body_grid, body_merged = _grid_expand(body_rows + footer_rows)

    root = parse_dom(html)
    table = root.find("table")
    caption_node = table.find("caption") if table else None
    caption = " ".join(caption_node.get_text(separator=" ", strip=True).split()) if caption_node else ""
    summary = (table.get("summary") or "") if table else ""
    nested = bool(table and any(d.tag == "table" for d in table.iter_desc()))

    out = {
        "headers": headers,
        "rows": body_grid,
        "caption": caption,
        "summary": summary,
        "metadata": {
            "row_count": len(body_grid),
            "column_count": len(headers),
            "has_headers": bool(headers),
            "has_merged_cells": hdr_merged or body_merged,
            "nested_tables": nested,
            "table_type": "data",
        },
    }
    return json.dumps(out)
