"""Line/token featurizer conformance (M5-M8) — hand-computed vectors."""

from datacat_ray.stages.line_features import (
    featurize_lines,
    line_pattern,
    mine_repetitive_patterns,
    serialize_features,
)
from datacat_ray.stages.token_features import (
    featurize_body_tokens,
    serialize_token_features,
)
from datacat_ray.stages.tokenizer import tokenize_document


def _line(text, block_id=0, page=0, j=0, n=1, size=12.0, bold=False, italic=False):
    return {
        "text": text,
        "block_id": block_id,
        "page": page,
        "line_in_block": j,
        "block_n_lines": n,
        "font_size": size,
        "bold": bold,
        "italic": italic,
    }


def test_line_features_hand_checked():
    lines = [
        _line("Vente du 13 mai 1860", block_id=0, size=24.0, bold=True),
        _line("12. Monnaies d'Italie: 39 pièces. AR.", block_id=1),
        _line("conditions de la vente", block_id=2),
    ]
    f = featurize_lines(lines)
    v = f[0]
    assert v["token"] == "Vente" and v["second_token"] == "du"
    assert v["lowercase"] == "vente"
    assert (v["prefix1"], v["prefix2"], v["prefix3"], v["prefix4"]) == (
        "V", "Ve", "Ven", "Vent",
    )
    assert v["block_status"] == "BLOCKSTART" and v["page_status"] == "PAGESTART"
    assert v["capitalisation"] == "INITCAP" and v["digit"] == "NODIGIT"
    assert v["month"] == 1 and v["year"] == 1
    assert v["bold"] == 1 and v["rel_doc_position"] == 0
    v1 = f[1]
    assert v1["token"] == "12." and v1["digit"] == "CONTAINSDIGITS"
    assert v1["font_size_status"] == "LOWERFONT"
    assert v1["rel_doc_position"] == 4  # floor(12*1/3)
    v2 = f[2]
    assert v2["common_name"] == 1 and v2["capitalisation"] == "NOCAPS"
    # serialization has exactly 33 space-separated fields for simple tokens
    assert len(serialize_features(v2).split(" ")) == 33


def test_repetitive_pattern_mining():
    texts = ["Page 1 — Catalogue Hoffmann", "Entry text here",
             "Page 2 — Catalogue Hoffmann", "Other body line",
             "Page 3 — Catalogue Hoffmann"]
    rep, first = mine_repetitive_patterns(texts)
    assert rep == [True, False, True, False, True]
    assert first == [True, False, False, False, False]
    assert line_pattern("Page 12 — x") == line_pattern("Page 3 — x")


def test_body_token_features_hand_checked():
    lines, tokens, token_line = tokenize_document(
        [
            {
                "text": "1. Monnaies rares",
                "page": 0,
                "font_size": 12.0,
                "bold": False,
                "italic": False,
                "link_density": 0.0,
            }
        ]
    )
    feats, idx = featurize_body_tokens(tokens, token_line, lines, [(0, len(tokens))])
    # whitespace tokens skipped
    assert [f["token"] for f in feats] == ["1", ".", "Monnaies", "rares"]
    assert feats[0]["line_status"] == "LINESTART"
    assert feats[0]["digit"] == "ALLDIGIT"
    assert feats[1]["punct_type"] == "DOT"
    assert feats[3]["line_status"] == "LINEEND"
    assert feats[2]["suffix4"] == "aies"
    assert tokens[idx[2]] == "Monnaies"
    assert len(serialize_token_features(feats[0]).split(" ")) == 24


def test_empty_doc():
    assert featurize_lines([]) == []
    feats, idx = featurize_body_tokens([], [], [], [])
    assert feats == [] and idx == []


def test_serialized_arity_matches_reference_raw_format():
    """Our serialized feature lines have the same field arity as the
    reference's committed raw corpus files (33 segmenter / 24 body cols)."""
    import os

    import pytest

    from datacat_ray.stages.line_features import LINE_FEATURE_STRUCT
    from datacat_ray.stages.token_features import TOKEN_FEATURE_STRUCT

    assert len(LINE_FEATURE_STRUCT) == 33
    assert len(TOKEN_FEATURE_STRUCT) == 24

    seg_dir = "/root/reference/resources/dataset/datacat-segmenter/corpus/raw"
    if not os.path.isdir(seg_dir):
        pytest.skip("reference checkout not present")
    f = sorted(os.listdir(seg_dir))[0]
    with open(os.path.join(seg_dir, f), encoding="utf-8", errors="replace") as fh:
        for line in fh:
            line = line.strip()
            if line:
                # training raw lines are 33 feature cols (+1 label in some files)
                assert len(line.split(" ")) in (33, 34)
                break
