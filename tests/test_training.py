"""Trainer-side operators: seeded split, J1 alignment join, A5 metrics,
S6 TEI round-trip (reference semantics at
``DatacatSegmenterTrainer.java:150-215`` and the TEI sax parsers)."""

from __future__ import annotations

import pyarrow as pa

from datacat_ray.pipelines.training import (
    align_labels,
    eval_metrics,
    nfold_of,
    split_of,
)
from datacat_ray.stages.tei import assemble_segmenter_tei, parse_segmenter_tei


def test_split_deterministic_and_roughly_proportional():
    splits = [split_of(i, train_pct=80, seed=42) for i in range(1000)]
    assert splits == [split_of(i, train_pct=80, seed=42) for i in range(1000)]
    frac = splits.count("train") / len(splits)
    assert 0.75 < frac < 0.85
    # different seed → different assignment somewhere
    assert splits != [split_of(i, train_pct=80, seed=7) for i in range(1000)]


def test_nfold_covers_all_folds():
    folds = {nfold_of(i, n_folds=5) for i in range(200)}
    assert folds == set(range(5))


def test_align_exact_match():
    labeled = [("Vente", "<front>"), ("du", "<front>"), ("12", "<body>")]
    out = align_labels(["Vente", "du", "12"], labeled)
    assert out is not None
    aligned, invalid = out
    assert invalid == 0
    assert [l for _, l in aligned] == ["<front>", "<front>", "<body>"]


def test_align_resyncs_within_window_and_reuses_previous_label():
    # feature side lacks one token ("extra" only on the labeled side):
    # resync window skips it; the miss ("XXX") reuses the previous label
    labeled = [("a", "<front>"), ("extra", "<front>"), ("b", "<body>"),
               ("c", "<body>")]
    out = align_labels(["a", "XXX", "b", "c"], labeled)
    assert out is not None
    aligned, invalid = out
    assert invalid == 1
    assert [l for _, l in aligned] == ["<front>", "<front>", "<body>", "<body>"]


def test_align_unicode_normalization():
    # ﬁ (U+FB01) NFKC-normalizes to "fi"
    out = align_labels(["ﬁn"], [("fin", "<body>")])
    assert out is not None and out[0][0][1] == "<body>"


def test_align_drops_hopeless_document():
    labeled = [(f"w{i}", "<body>") for i in range(30)]
    # nothing matches → consecutive invalids blow the cap
    assert align_labels([f"x{i}" for i in range(30)], labeled) is None


def test_eval_metrics_counts(ray_session):
    import ray.data

    pairs = ray.data.from_arrow(pa.table({
        "gold": ["a", "a", "a", "b", "b", "c"],
        "pred": ["a", "a", "b", "b", "a", "c"],
    }))
    t = eval_metrics(pairs)
    rows = {r["label"]: r for r in t.to_pylist()}
    assert rows["a"]["tp"] == 2 and rows["a"]["fp"] == 1 and rows["a"]["fn"] == 1
    assert rows["a"]["precision_micros"] == 666666  # floor(2/3 * 1e6)
    assert rows["__micro__"]["tp"] == 4
    assert rows["__micro__"]["fp"] == rows["__micro__"]["fn"] == 2


def test_tei_roundtrip():
    lines = [
        {"text": "Vente du 3 mai & <cie>"}, {"text": "COLLECTION"},
        {"text": "12. Monnaies"}, {"text": "13. Médailles"},
        {"text": "TABLE"},
    ]
    labels = ["I-<front>", "<front>", "I-<body>", "<body>", "I-<back>"]
    tei = assemble_segmenter_tei("http://x", "fr", lines, labels)
    parsed = parse_segmenter_tei(tei)
    assert parsed == [
        ("Vente du 3 mai & <cie>", "<front>"), ("COLLECTION", "<front>"),
        ("12. Monnaies", "<body>"), ("13. Médailles", "<body>"),
        ("TABLE", "<back>"),
    ]
