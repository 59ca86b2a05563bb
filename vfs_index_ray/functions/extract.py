"""HTML -> text extraction over the Common-Crawl input shape.

BASELINE.json's input_hint names the pages table (url, warc_ts,
html:binary, text:string, lang) and the per-row invariant "byte-identical
extracted text per url".  The reference engine indexes pre-extracted
records (indexer.go feeds decoded json/csv fields straight to the
tokenizer); at web scale the text column is *produced* from the crawled
html, so the extractor is part of the build: a stateless vectorized
map_batches stage that runs entirely in Arrow's RE2 kernels
(pyarrow.compute.replace_substring_regex) — no per-row Python.

Pipeline shape: ``read_parquet(columns=[html, url]) -> map_batches(
extract_text_batch) -> tokenize``.  IndexBuilder(html_col="html") wires
it in; `extract_text` is the reusable column kernel.

Extraction semantics (deterministic, order matters):
  1. drop <head>...</head> (titles/meta are not body text)
  2. drop <script>/<style> blocks and <!-- comments -->
  3. strip every remaining tag
  4. decode the named/numeric entities &lt; &gt; &quot; &#39; &nbsp;
     (to U+00A0, html.unescape parity) and finally &amp; (last, so
     "&amp;lt;" decodes to the literal "&lt;" exactly like a browser's
     single-pass decoder)

`wrap_html` is the inverse fixture generator (escape + template) used by
the synthetic pages corpus and the `extract_text` driver query, so
``extract_text(wrap_html(t)) == t`` byte-for-byte is an oracle-checkable
invariant on arbitrary text.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2: no backreferences, so script/style are separate patterns.
# (?is) = case-insensitive, dot-matches-newline; .*? non-greedy.
_BLOCK_PATTERNS = (
    r"(?is)<head\b[^>]*>.*?</head\s*>",
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?s)<!--.*?-->",
)
_TAG_PATTERN = r"(?s)<[^>]*>"

# decoded after tag stripping; &amp; strictly last
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_text(html: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized html(binary|string) -> text(string). Pure Arrow RE2."""
    arr = html
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        arr = pc.cast(arr, pa.string())
    for pat in _BLOCK_PATTERNS:
        arr = pc.replace_substring_regex(arr, pattern=pat, replacement="")
    arr = pc.replace_substring_regex(arr, pattern=_TAG_PATTERN, replacement="")
    for ent, ch in _ENTITIES:
        arr = pc.replace_substring(arr, pattern=ent, replacement=ch)
    return arr


def extract_text_batch(batch: pa.Table, *, html_col: str = "html",
                       text_col: str = "text",
                       drop_html: bool = True) -> pa.Table:
    """map_batches stage: derive text_col from html_col (zero-copy in,
    one new string column out)."""
    text = extract_text(batch.column(html_col))
    if text_col in batch.column_names:
        batch = batch.drop_columns([text_col])
    batch = batch.append_column(text_col, text)
    if drop_html and html_col != text_col:
        batch = batch.drop_columns([html_col])
    return batch


# ---------------------------------------------------------------- fixture
def escape_html(text: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Minimal body-text escaping (the wrap side of the invariant)."""
    arr = text
    for ch, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        arr = pc.replace_substring(arr, pattern=ch, replacement=ent)
    return arr


def wrap_html(text: pa.Array | pa.ChunkedArray,
              title: pa.Array | pa.ChunkedArray | None = None) -> pa.Array:
    """Deterministic page template whose extraction is byte-identical to
    ``text``: head/title + style + attributes + a trailing script, body
    content escaped."""
    n = len(text)
    body = escape_html(text)
    title_part = title if title is not None else pa.array([""] * n)
    parts = [
        pa.array(["<html><head><title>"] * n),
        pc.cast(title_part, pa.string()),
        pa.array(['</title><style>body{margin:0}</style></head>'
                  '<body><p class="main" data-x="1&amp;2">'] * n),
        body if isinstance(body, pa.Array) else body.combine_chunks(),
        pa.array(["</p><script>var n=1;</script></body></html>"] * n),
    ]
    out = pc.binary_join_element_wise(*parts, "")
    return pc.cast(out, pa.binary())
