"""Tokenization + document statistics stage (SURVEY.md M1 + M2).

Reference semantics: ``doc.addTokenizedDocument(config)`` builds the
LayoutToken stream (``DatacatSegmenterParser.java:109``); the rawtxt sink is
the concatenation of every token text including whitespace tokens
(``DatacatSegmenterParser.java:820-827``); lines are the segmenter's labeling
unit derived from block text (``DatacatSegmenterParser.java:393-404``).

Here each DOM block's text is wrapped into pseudo-layout lines of
``WRAP_WIDTH`` characters (the HTML analogue of the PDF's physical lines),
tokens are produced per line with explicit ``"\\n"`` tokens between lines, and
the invariant ``"".join(tokens) == "\\n".join(line texts)`` holds per
document — that concatenation IS the ``extracted_text`` byte-identity
surface.

Stage contract (stateless ``map_batches``, Arrow in / Arrow out):

    (url, lang, blocks, error) →
    (url, lang, error,
     lines:  list<struct<text, block_id, page, line_in_block, block_n_lines,
                         font_size, bold, italic>>,
     tokens: list<string>,            # full-document layout token stream
     token_line: list<int32>)         # line id owning each token
"""

from __future__ import annotations

import pyarrow as pa

from datacat_ray.functions.textkit import tokenize_layout

WRAP_WIDTH = 80

LINE_STRUCT = pa.struct(
    [
        ("text", pa.string()),
        ("block_id", pa.int32()),
        ("page", pa.int32()),
        ("line_in_block", pa.int32()),
        ("block_n_lines", pa.int32()),
        ("font_size", pa.float32()),
        ("bold", pa.bool_()),
        ("italic", pa.bool_()),
    ]
)

TOKENIZED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("error", pa.string()),
        ("lines", pa.list_(LINE_STRUCT)),
        ("tokens", pa.list_(pa.string())),
        ("token_line", pa.list_(pa.int32())),
    ]
)


def wrap_text(text: str, width: int = WRAP_WIDTH) -> list[str]:
    """Deterministic greedy word wrap; words longer than ``width`` stand
    alone on their own line. Never drops or duplicates characters except the
    spaces consumed at wrap points (matching physical-line semantics where a
    line break replaces the inter-word space)."""
    if len(text) <= width:
        return [text] if text else []
    out: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for word in text.split(" "):
        add = len(word) if not cur else cur_len + 1 + len(word)
        if cur and add > width:
            out.append(" ".join(cur))
            cur = [word]
            cur_len = len(word)
        else:
            cur.append(word)
            cur_len = add
    if cur:
        out.append(" ".join(cur))
    return out


def tokenize_document(blocks: list[dict]) -> tuple[list[dict], list[str], list[int]]:
    """Pure per-document kernel: blocks → (lines, tokens, token_line)."""
    lines: list[dict] = []
    for block_id, blk in enumerate(blocks):
        wrapped = wrap_text(blk["text"])
        n = len(wrapped)
        for j, lt in enumerate(wrapped):
            lines.append(
                {
                    "text": lt,
                    "block_id": block_id,
                    "page": blk["page"],
                    "line_in_block": j,
                    "block_n_lines": n,
                    "font_size": blk["font_size"],
                    "bold": blk["bold"],
                    "italic": blk["italic"],
                }
            )
    tokens: list[str] = []
    token_line: list[int] = []
    for i, ln in enumerate(lines):
        if i > 0:
            tokens.append("\n")
            token_line.append(i - 1)
        ltoks = tokenize_layout(ln["text"])
        tokens.extend(ltoks)
        token_line.extend([i] * len(ltoks))
    return lines, tokens, token_line


# document-size guard rails (reference: TOO_MANY_TOKENS / TOO_MANY_BLOCKS
# hard caps at DatacatSegmenterParser.java:140-142, 260-263 — there they
# throw; here the row is routed to the error side output, SURVEY.md M3/M4)
DEFAULT_MAX_TOKENS = 30_000
DEFAULT_MAX_BLOCKS = 3_000


def tokenize_stage(
    batch: pa.Table,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    max_blocks: int = DEFAULT_MAX_BLOCKS,
) -> pa.Table:
    urls = batch["url"].to_pylist()
    tss = batch["warc_ts"].to_pylist()
    langs = batch["lang"].to_pylist()
    errors = batch["error"].to_pylist()
    blocks_col = batch["blocks"].to_pylist()
    lines_col, tokens_col, token_line_col = [], [], []
    for i, blocks in enumerate(blocks_col):
        blocks = blocks or []
        if len(blocks) > max_blocks:
            errors[i] = errors[i] or f"TOO_MANY_BLOCKS: {len(blocks)}"
            lines_col.append([]); tokens_col.append([]); token_line_col.append([])
            continue
        lines, tokens, token_line = tokenize_document(blocks)
        if len(tokens) > max_tokens:
            errors[i] = errors[i] or f"TOO_MANY_TOKENS: {len(tokens)}"
            lines, tokens, token_line = [], [], []
        lines_col.append(lines)
        tokens_col.append(tokens)
        token_line_col.append(token_line)
    return pa.Table.from_pydict(
        {
            "url": urls,
            "warc_ts": tss,
            "lang": langs,
            "error": errors,
            "lines": lines_col,
            "tokens": tokens_col,
            "token_line": token_line_col,
        },
        schema=TOKENIZED_SCHEMA,
    )
