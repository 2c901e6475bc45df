"""CRF decode machinery: template expansion, Viterbi, determinism."""

from datacat_ray.stages.crf import (
    CRFDecoder,
    CRFModel,
    expand_templates,
    strip_begin_prefix,
    with_begin_prefix,
)
from datacat_ray.stages.models import BODY_MODEL, SEGMENTER_MODEL

TOY = CRFModel(
    labels=("A", "B"),
    templates=(("U", ((0, "x"),)), ("Ub", ((-1, "x"), (0, "x")))),
    weights={"U:a": {"A": 2.0}, "U:b": {"B": 2.0}},
    transitions={("A", "B"): 0.5},
    init={"A": 0.1},
    sticky=1.0,
)


def test_expand_templates_boundaries():
    feats = [{"x": "a"}, {"x": "b"}]
    rows = expand_templates(TOY, feats)
    assert rows[0] == ["U:a", "Ub:_B-1_|a"]
    assert rows[1] == ["U:b", "Ub:a|b"]


def test_viterbi_basic_and_sticky():
    dec = CRFDecoder(TOY)
    assert dec.decode([{"x": "a"}, {"x": "a"}, {"x": "b"}]) == ["A", "A", "B"]
    # one weak contrary observation is absorbed by stickiness
    assert dec.decode([{"x": "a"}, {"x": "?"}, {"x": "a"}]) == ["A", "A", "A"]
    assert dec.decode([]) == []


def test_decode_zero_ref_model():
    """A model whose templates expand to NO refs (comments-only template
    file) still decodes n positions from transitions alone — regression
    pin for the column-wise key construction (zip of zero columns)."""
    m = CRFModel(labels=("A", "B"), templates=(),
                 weights={}, transitions={("A", "A"): 1.0}, init={"A": 0.5})
    dec = CRFDecoder(m)
    assert dec.decode([{"x": "q"}, {"x": "r"}, {"x": "s"}]) == ["A", "A", "A"]
    assert dec.decode([]) == []


def test_decode_deterministic_tie_break():
    flat = CRFModel(labels=("A", "B"), templates=(("U", ((0, "x"),)),),
                    weights={}, transitions={})
    dec = CRFDecoder(flat)
    # all scores equal → stable argmax picks the first label, every time
    assert dec.decode([{"x": "q"}] * 5) == ["A"] * 5


def test_begin_prefix_roundtrip():
    labels = ["<front>", "<front>", "<body>", "<body>", "<front>"]
    pref = with_begin_prefix(labels)
    assert pref == ["I-<front>", "<front>", "I-<body>", "<body>", "I-<front>"]
    assert [strip_begin_prefix(x) for x in pref] == labels


def test_segmenter_model_recovers_fixture_zones():
    import random

    from datacat_ray.fixtures import make_catalogue_html
    from datacat_ray.stages.dom import parse_main_blocks
    from datacat_ray.stages.line_features import featurize_lines
    from datacat_ray.stages.tokenizer import tokenize_document

    rng = random.Random(5)
    html, _ = make_catalogue_html(rng, n_entries=8)
    lines, _, _ = tokenize_document(parse_main_blocks(html))
    dec = CRFDecoder(SEGMENTER_MODEL)
    labels = dec.decode(featurize_lines(lines))
    # fixture docs: 8 front lines, 8 entries, 4 back lines
    assert labels[:8] == ["<front>"] * 8
    assert labels[8:16] == ["<body>"] * 8
    assert labels[16:] == ["<back>"] * 4


def test_body_model_starts_with_begin_state():
    dec = CRFDecoder(BODY_MODEL)
    feats = [
        {"lowercase": "x", "digit": "ALLDIGIT", "capitalisation": "NOCAPS",
         "line_status": "LINESTART", "punct_type": "NOPUNCT", "bold": 0,
         "rel_doc_position": 5},
        {"lowercase": "y", "digit": "NODIGIT", "capitalisation": "NOCAPS",
         "line_status": "LINEIN", "punct_type": "NOPUNCT", "bold": 0,
         "rel_doc_position": 5},
    ]
    labels = dec.decode(feats)
    assert labels[0].startswith("I-")
    assert labels[0] == "I-<entry>"


def test_parse_crfpp_template_inline():
    from datacat_ray.stages.crf import parse_crfpp_template

    text = """# Token (0)
U00:%x[-1,0]
U04:%x[0,0]

# conjunction
U0A:%x[-1,0]/%x[0,1]
B
"""
    fields = ["token", "lowercase"]
    t = parse_crfpp_template(text, fields)
    assert t == (
        ("U00", ((-1, "token"),)),
        ("U04", ((0, "token"),)),
        ("U0A", ((-1, "token"), (0, "lowercase"))),
    )


def test_parse_reference_template_files():
    """Parse the reference's real committed CRF++ templates (read-only)."""
    import os

    import pytest

    from datacat_ray.stages.crf import parse_crfpp_template

    base = "/root/reference/resources/dataset"
    seg = f"{base}/datacat-segmenter/crfpp-templates/datacat-segmenter.template"
    if not os.path.exists(seg):
        pytest.skip("reference checkout not present")
    fields = [f"f{i}" for i in range(40)]  # positional stand-in names
    t = parse_crfpp_template(open(seg).read(), fields)
    assert len(t) > 30
    cols = {name for _, refs in t for _, name in refs}
    assert "f0" in cols and "f32" in cols  # 33-column vector referenced


def test_format_eval_report_layout():
    import pyarrow as pa

    from datacat_ray.pipelines.training import format_eval_report

    m = pa.table({
        "label": ["<entry>", "__micro__"],
        "tp": [86, 86], "fp": [13, 13], "fn": [15, 15],
        "precision_micros": [868686, 868686],
        "recall_micros": [851485, 851485],
        "f1_micros": [860000, 860000],
    })
    rep = format_eval_report(m, accuracy_total=1000)
    assert "===== Field-level results =====" in rep
    assert "<entry>" in rep and "all (micro avg.)" in rep
    assert "86.87" in rep  # precision rendered at 2 decimals
