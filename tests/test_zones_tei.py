"""Zone decode (M13) + TEI assembly state machines (M15/M16)."""

from datacat_ray.stages.tei import (
    assemble_body_tei,
    assemble_segmenter_tei,
    body_label_runs,
    extracted_text,
)
from datacat_ray.stages.tokenizer import tokenize_document
from datacat_ray.stages.zones import decode_zones, line_runs, zone_token_indices


def _mk(texts):
    blocks = [
        {"text": t, "page": 0, "font_size": 12.0, "bold": False,
         "italic": False, "link_density": 0.0}
        for t in texts
    ]
    return tokenize_document(blocks)


def test_line_runs_strips_begin_prefix():
    assert line_runs(["I-<front>", "<front>", "I-<body>"]) == [
        ("<front>", 0, 1),
        ("<body>", 2, 2),
    ]


def test_decode_zones_partitions_token_stream():
    lines, tokens, token_line = _mk(["aa bb", "cc dd", "ee"])
    zones = decode_zones(
        ["I-<front>", "I-<body>", "<body>"], token_line, len(tokens)
    )
    assert zones[0] == {"label": "<front>", "start": 0, "end": 4}
    assert zones[-1]["end"] == len(tokens)
    # spans tile the stream exactly
    for a, b in zip(zones, zones[1:]):
        assert a["end"] == b["start"]
    assert zone_token_indices(zones, "<body>") == [(4, len(tokens))]


def test_extracted_text_byte_identity():
    lines, tokens, _ = _mk(["aa bb", "cc"])
    assert extracted_text(tokens) == "aa bb\ncc"


def test_segmenter_tei_exact_bytes():
    lines, tokens, token_line = _mk(["Front line", "Body <line>"])
    tei = assemble_segmenter_tei(
        "http://u", "fr", lines, ["I-<front>", "I-<body>"]
    )
    assert tei.startswith(
        '<?xml version="1.0" encoding="UTF-8"?>\n<tei xml:space="preserve">\n'
    )
    assert "\t\t\t<front>Front line<lb/>\n</front>\n" in tei
    assert "\t\t\t<body>Body &lt;line&gt;<lb/>\n</body>\n" in tei
    assert tei.endswith("\t</text>\n</tei>\n")
    # null lang falls back to "fr" (DatacatSegmenterParser.java:810-818)
    assert 'xml:lang="fr"' in assemble_segmenter_tei("u", None, lines, ["<other>", "<other>"])


def test_body_label_runs_and_tei():
    lines, tokens, token_line = _mk(["1. aa", "2. bb"])
    # feature positions skip whitespace: tokens are
    # ['1','.',' ','aa','\n','2','.',' ','bb'] → non-space at 0,1,3,5,6,8
    body_labels = ["I-<entry>", "<entry>", "<entry>", "I-<entry>", "<entry>", "<entry>"]
    idx = [0, 1, 3, 5, 6, 8]
    runs = body_label_runs(body_labels, idx)
    assert runs == [
        {"label": "<entry>", "start": 0, "end": 4},
        {"label": "<entry>", "start": 5, "end": 9},
    ]
    tei = assemble_body_tei("u", "fr", tokens, runs)
    assert "\t\t\t<entry>1. aa</entry>\n" in tei
    # newline tokens inside a run render as <lb/>
    runs_all = [{"label": "<other>", "start": 0, "end": len(tokens)}]
    tei2 = assemble_body_tei("u", "fr", tokens, runs_all)
    assert '<note type="other">1. aa<lb/>\n2. bb</note>' in tei2
