"""Tokenizer stage kernels (M1) + guard rails (M3/M4)."""

import pyarrow as pa

from datacat_ray.stages.dom import BLOCKS_SCHEMA
from datacat_ray.stages.tokenizer import (
    tokenize_document,
    tokenize_stage,
    wrap_text,
)


def _blk(text, block_id=0, page=0):
    return {
        "text": text,
        "page": page,
        "font_size": 12.0,
        "bold": False,
        "italic": False,
        "link_density": 0.0,
    }


def test_wrap_text_deterministic():
    assert wrap_text("short line") == ["short line"]
    long = " ".join(["word"] * 40)  # 199 chars
    lines = wrap_text(long, width=80)
    assert all(len(l) <= 80 for l in lines)
    assert " ".join(lines) == long  # wrap only replaces spaces with breaks
    assert wrap_text("") == []
    assert wrap_text("x" * 100, width=80) == ["x" * 100]  # oversize word stands


def test_tokenize_document_invariant():
    lines, tokens, token_line = tokenize_document(
        [_blk("12. Monnaies ; 39 pièces."), _blk("TABLE DES MATIÈRES")]
    )
    assert "".join(tokens) == "\n".join(ln["text"] for ln in lines)
    assert len(tokens) == len(token_line)
    # newline between lines attributed to the preceding line
    nl = tokens.index("\n")
    assert token_line[nl] == 0 and token_line[nl + 1] == 1


def test_block_line_numbering():
    long = " ".join(["word"] * 40)
    lines, _, _ = tokenize_document([_blk(long)])
    assert len(lines) > 1
    assert lines[0]["line_in_block"] == 0
    assert lines[-1]["line_in_block"] == lines[-1]["block_n_lines"] - 1


def _batch(blocks_lists):
    return pa.Table.from_pydict(
        {
            "url": [f"u{i}" for i in range(len(blocks_lists))],
            "warc_ts": [0] * len(blocks_lists),
            "lang": ["fr"] * len(blocks_lists),
            "blocks": blocks_lists,
            "error": [None] * len(blocks_lists),
        },
        schema=BLOCKS_SCHEMA,
    )


def test_cap_guards_route_to_error_side_output():
    big = [_blk(f"line {i}") for i in range(50)]
    out = tokenize_stage(_batch([big, [_blk("fine line")]]), max_tokens=10, max_blocks=40)
    errs = out["error"].to_pylist()
    assert errs[0] and errs[0].startswith("TOO_MANY_BLOCKS")
    assert errs[1] is None
    out2 = tokenize_stage(_batch([big[:30]]), max_tokens=10, max_blocks=100)
    assert out2["error"].to_pylist()[0].startswith("TOO_MANY_TOKENS")
    assert out2["tokens"].to_pylist()[0] == []


def test_wrap_text_conservation_property():
    """Property: wrapping never loses or duplicates characters except the
    single inter-word space consumed at each wrap point."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from datacat_ray.stages.tokenizer import wrap_text

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters=" \n\r\t"),
        min_size=1, max_size=30), min_size=0, max_size=30))
    def prop(words):
        text = " ".join(words)
        lines = wrap_text(text, width=20)
        assert " ".join(lines) == text  # join with the consumed spaces
        for ln in lines[:-1] if len(lines) > 1 else []:
            # no line exceeds width unless it is a single oversized word
            assert len(ln) <= 20 or " " not in ln

    prop()


def test_tokenize_layout_roundtrip_property():
    """Property: concatenating layout tokens reproduces the input exactly
    (the rawtxt byte-identity invariant, S9) for arbitrary unicode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from datacat_ray.functions.textkit import tokenize_layout

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                   max_size=300))
    def prop(text):
        assert "".join(tokenize_layout(text)) == text

    prop()
