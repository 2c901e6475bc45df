"""Per-token feature vectors for the body model (SURVEY.md M7 + M14).

Re-creates the reference's 24-column token featurization over the ``<body>``
zone slice (``DatacatBodySegmentationParser.java:123-526``; serialization
``FeaturesVectorDatacatEntries.java:51-157``): token with prefixes/suffixes
1-4, block/line status with look-ahead, alignment status, font transitions,
bold/italic, caps/digit classes, punctuation class, binned positions, bitmap
adjacency. Whitespace tokens are skipped for the CRF (the TEI assembler
re-inserts them from the original tokenization — the J2 resync join), so each
feature position records the absolute token index it came from.

Canonical 24-field order:

    token lowercase prefix1-4 suffix1-4 block_status line_status
    alignment_status font_status font_size_status bold italic capitalisation
    digit single_char punct_type rel_doc_position rel_page_position
    bitmap_around

Alignment is constant ``ALIGNEDLEFT`` in the HTML graft (no x-geometry; the
reference derives it from line-start indentation,
``DatacatBodySegmentationParser.java:279-295``).
"""

from __future__ import annotations

import pyarrow as pa

from datacat_ray.functions.textkit import (
    capitalisation_class,
    digit_class,
    linear_scaling,
    prefix,
    punct_type,
    suffix,
)
from datacat_ray.stages.line_features import NBBINS_POSITION

TOKEN_FEATURE_STRUCT = pa.struct(
    [
        ("token", pa.string()),
        ("lowercase", pa.string()),
        ("prefix1", pa.string()),
        ("prefix2", pa.string()),
        ("prefix3", pa.string()),
        ("prefix4", pa.string()),
        ("suffix1", pa.string()),
        ("suffix2", pa.string()),
        ("suffix3", pa.string()),
        ("suffix4", pa.string()),
        ("block_status", pa.string()),
        ("line_status", pa.string()),
        ("alignment_status", pa.string()),
        ("font_status", pa.string()),
        ("font_size_status", pa.string()),
        ("bold", pa.int8()),
        ("italic", pa.int8()),
        ("capitalisation", pa.string()),
        ("digit", pa.string()),
        ("single_char", pa.int8()),
        ("punct_type", pa.string()),
        ("rel_doc_position", pa.int8()),
        ("rel_page_position", pa.int8()),
        ("bitmap_around", pa.int8()),
    ]
)

_TOKEN_FIELD_NAMES = [f.name for f in TOKEN_FEATURE_STRUCT]


def _is_space_token(tok: str) -> bool:
    return tok.isspace()


_STATIC_CACHE_MAX = 200_000
_static_cache: dict[str, dict] = {}


def _token_static(tok: str) -> dict:
    """The 13 feature fields that depend ONLY on the token string, memoized
    per worker process — natural-language token distributions are Zipfian,
    so hit rates are high and the per-occurrence cost drops to a dict copy."""
    d = _static_cache.get(tok)
    if d is None:
        if len(_static_cache) >= _STATIC_CACHE_MAX:
            _static_cache.clear()
        d = {
            "token": tok,
            "lowercase": tok.lower(),
            "prefix1": prefix(tok, 1),
            "prefix2": prefix(tok, 2),
            "prefix3": prefix(tok, 3),
            "prefix4": prefix(tok, 4),
            "suffix1": suffix(tok, 1),
            "suffix2": suffix(tok, 2),
            "suffix3": suffix(tok, 3),
            "suffix4": suffix(tok, 4),
            "capitalisation": capitalisation_class(tok),
            "digit": digit_class(tok),
            "single_char": int(len(tok) == 1),
            "punct_type": punct_type(tok),
        }
        _static_cache[tok] = d
    return d


def featurize_body_tokens(
    tokens: list[str],
    token_line: list[int],
    lines: list[dict],
    body_ranges: list[tuple[int, int]],
) -> tuple[list[dict], list[int]]:
    """Pure per-document kernel: the ``<body>``-sliced token stream →
    (feature dicts, absolute token indices). Whitespace tokens are skipped.
    """
    n_lines = len(lines)
    # page extents for rel_page_position (line granularity, as in M6)
    page_first: dict[int, int] = {}
    page_count: dict[int, int] = {}
    for i, ln in enumerate(lines):
        pg = ln["page"]
        page_first.setdefault(pg, i)
        page_count[pg] = page_count.get(pg, 0) + 1

    # first/last non-space token index per line and per block
    line_first: dict[int, int] = {}
    line_last: dict[int, int] = {}
    block_first: dict[int, int] = {}
    block_last: dict[int, int] = {}
    for t, tok in enumerate(tokens):
        if _is_space_token(tok):
            continue
        li = token_line[t]
        b = lines[li]["block_id"]
        line_first.setdefault(li, t)
        line_last[li] = t
        block_first.setdefault(b, t)
        block_last[b] = t

    feats: list[dict] = []
    indices: list[int] = []
    prev_font: tuple | None = None
    prev_size: float | None = None
    # line-derived values hoisted out of the token loop: tokens stream in
    # line order, so everything keyed on li recomputes only at line breaks
    cur_li = -1
    font = size = None
    bold = ital = 0
    rel_doc = rel_page = 0
    lf = ll = bf = bl = None
    for start, end in body_ranges:
        for t in range(start, end):
            tok = tokens[t]
            if _is_space_token(tok):
                continue
            li = token_line[t]
            if li != cur_li:
                cur_li = li
                ln = lines[li]
                b = ln["block_id"]
                font = (ln["bold"], ln["italic"])
                size = ln["font_size"]
                bold = int(bool(ln["bold"]))
                ital = int(bool(ln["italic"]))
                pg = ln["page"]
                rel_doc = linear_scaling(li, n_lines, NBBINS_POSITION)
                rel_page = linear_scaling(
                    li - page_first[pg], page_count[pg], NBBINS_POSITION
                )
                lf, ll = line_first.get(li), line_last.get(li)
                bf, bl = block_first.get(b), block_last.get(b)
            if t == bf:
                block_status = "BLOCKSTART"
            elif t == bl:
                block_status = "BLOCKEND"
            else:
                block_status = "BLOCKIN"
            if t == lf:
                line_status = "LINESTART"
            elif t == ll:
                line_status = "LINEEND"
            else:
                line_status = "LINEIN"
            font_status = "SAMEFONT" if font == prev_font else "NEWFONT"
            if prev_size is None or size == prev_size:
                font_size_status = "SAMEFONTSIZE"
            elif size > prev_size:
                font_size_status = "HIGHERFONT"
            else:
                font_size_status = "LOWERFONT"
            prev_font, prev_size = font, size
            f = dict(_token_static(tok))
            f["block_status"] = block_status
            f["line_status"] = line_status
            f["alignment_status"] = "ALIGNEDLEFT"
            f["font_status"] = font_status
            f["font_size_status"] = font_size_status
            f["bold"] = bold
            f["italic"] = ital
            f["rel_doc_position"] = rel_doc
            f["rel_page_position"] = rel_page
            f["bitmap_around"] = 0
            feats.append(f)
            indices.append(t)
    return feats, indices


def serialize_token_features(feat: dict) -> str:
    """Canonical whitespace serialization (golden raw-corpus line format)."""
    return " ".join(str(feat[name]) for name in _TOKEN_FIELD_NAMES)
