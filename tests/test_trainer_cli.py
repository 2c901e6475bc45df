"""Full model-improvement loop (the DatacatTrainerRunner analogue,
SURVEY §3.4): create-training export → train from the exported corpus →
save/load the JSON artifact → decode with the loaded model."""

from __future__ import annotations

import pytest

from datacat_ray.fixtures import write_pages_parquet
from datacat_ray.pipelines.create_training import create_training_pairs
from datacat_ray.pipelines.trainer import (
    load_corpus,
    load_model_json,
    save_model_json,
    train_model,
)


@pytest.fixture(scope="module")
def exported_corpus(ray_session, tmp_path_factory):
    import ray.data

    tmp = tmp_path_factory.mktemp("trainer")
    pages_dir = write_pages_parquet(
        str(tmp / "pages"), n_urls=20, seed=9, rows_per_file=10
    )
    pages = ray.data.read_parquet(
        pages_dir, columns=["url", "warc_ts", "lang", "html", "text"]
    )
    out_dir = str(tmp / "corpus")
    create_training_pairs(pages, out_dir, concurrency=1).take_all()
    return out_dir


def test_load_corpus_reads_exported_layout(exported_corpus):
    docs = load_corpus(exported_corpus, "segmenter")
    assert len(docs) >= 15
    name, feats, gold = docs[0]
    assert len(feats) == len(gold) > 0
    assert set(feats[0]) == {f"f{i}" for i in range(33)}
    assert all(lb.startswith("<") for lb in gold)


def test_train_save_load_decode_roundtrip(exported_corpus, tmp_path):
    artifact, report = train_model(
        exported_corpus, model="segmenter", trainer="perceptron",
        train_pct=80, seed=1, epochs=2,
    )
    assert "micro" in report or "label" in report or report
    assert artifact["labels"] and artifact["weights"]
    path = save_model_json(str(tmp_path / "seg.json"), artifact)

    dec = load_model_json(path)
    docs = load_corpus(exported_corpus, "segmenter")
    _, feats, gold = docs[0]
    pred = dec.decode(feats)
    assert len(pred) == len(gold)
    assert set(pred) <= set(artifact["labels"])

    # determinism: same corpus + hyperparams → identical artifact
    artifact2, _ = train_model(
        exported_corpus, model="segmenter", trainer="perceptron",
        train_pct=80, seed=1, epochs=2,
    )
    assert artifact2["weights"] == artifact["weights"]
    assert artifact2["transitions"] == artifact["transitions"]


@pytest.fixture(scope="module")
def crf_artifact(exported_corpus, ray_session):
    artifact, report = train_model(
        exported_corpus, model="segmenter", trainer="crf",
        train_pct=100, max_iter=25, shards=4,
    )
    return artifact, report


def test_train_crf_estimator_on_export(exported_corpus, crf_artifact):
    """The CRF estimator path over an exported corpus: short budget, must
    fit the (machine-labeled, hence consistent) corpus well."""
    artifact, report = crf_artifact
    micro = [ln for ln in report.splitlines() if "micro" in ln.lower()]
    assert artifact["trainer"] == "crf"
    # train_pct=100 evaluates on the training docs: a CRF must fit
    # machine-generated labels nearly perfectly
    from datacat_ray.pipelines.trainer import load_corpus as _lc
    from datacat_ray.stages.train import _viterbi, expand_sequence
    from datacat_ray.stages.crf import parse_crfpp_template

    fields = [f"f{i}" for i in range(33)]
    templates = parse_crfpp_template(artifact["template"], fields)
    w = artifact["weights"]
    trans = {(a, b): v for a, b, v in artifact["transitions"]}
    tp = tot = 0
    for _, feats, gold in _lc(exported_corpus, "segmenter")[:5]:
        pred = _viterbi(expand_sequence(feats, templates),
                        artifact["labels"], w, trans)
        tp += sum(1 for a, b in zip(gold, pred) if a == b)
        tot += len(gold)
    assert tot and tp / tot >= 0.9, f"{tp}/{tot} ({micro})"


def test_raw_field_conversion_matches_serialization():
    """The deploy-time feature conversion (_to_raw_fields) must produce
    exactly the values training read back from the raw files — i.e. the
    canonical serialization split into columns."""
    import random

    from datacat_ray.fixtures import make_catalogue_html
    from datacat_ray.pipelines.extract import _LINE_FIELD_NAMES, _to_raw_fields
    from datacat_ray.stages.dom import parse_main_blocks
    from datacat_ray.stages.line_features import (
        featurize_lines,
        serialize_features,
    )
    from datacat_ray.stages.tokenizer import tokenize_document

    html, _ = make_catalogue_html(random.Random(4), n_entries=4)
    lines, _tok, _tl = tokenize_document(parse_main_blocks(html))
    feats = featurize_lines(lines)
    conv = _to_raw_fields(feats, _LINE_FIELD_NAMES)
    for d, c in zip(feats, conv):
        cols = serialize_features(d).split(" ")
        assert [c[f"f{i}"] for i in range(len(cols))] == cols


def test_deploy_trained_model_in_cascade(exported_corpus, tmp_path,
                                         crf_artifact, ray_session):
    """Deploy leg: a trained artifact swaps into the fused cascade via
    model_paths and labels real pages end to end."""
    import random

    from datacat_ray.fixtures import make_catalogue_html
    from datacat_ray.pipelines.extract import FusedExtractStage

    artifact, _ = crf_artifact
    path = save_model_json(str(tmp_path / "seg.json"), artifact)
    st = FusedExtractStage(model_paths={"segmenter": path})
    assert st.seg_raw_fields and not st.body_raw_fields
    html, _ = make_catalogue_html(random.Random(2), n_entries=5)
    (text, _main, tei, _tb, zones, _e, _lx, n_lines, _nt,
     err) = st._one("http://deploy", "fr", html.encode(), None)
    assert err is None and n_lines > 0
    assert zones and all(z["label"] in artifact["labels"] for z in zones)
    # the trained model was fit on machine labels from the frozen model,
    # so its zoning of a fixture page must agree substantially with it
    frozen = FusedExtractStage()
    zf = frozen._one("http://deploy", "fr", html.encode(), None)[4]
    # compare per-token zone labels
    def tok_labels(zs, n):
        out = [None] * n
        for z in zs:
            for t in range(z["start"], z["end"]):
                out[t] = z["label"]
        return out
    n = max(z["end"] for z in zones)
    a, b = tok_labels(zones, n), tok_labels(zf, n)
    agree = sum(1 for x, y in zip(a, b) if x == y) / n
    assert agree >= 0.7, f"trained-vs-frozen zone agreement {agree:.2f}"


def test_cli_train_command(exported_corpus, tmp_path, ray_session, capsys):
    """The train subcommand end to end through argparse (catches missing
    argument wiring the direct train_model tests can't see)."""
    import os

    from datacat_ray.cli import main

    out = str(tmp_path / "m.json")
    rc = main(["train", exported_corpus, "--trainer", "perceptron",
               "--epochs", "2", "--train-pct", "100", "--out", out])
    assert rc == 0 and os.path.exists(out)
    captured = capsys.readouterr()
    assert "micro" in captured.out
    assert "TRAINING documents" in captured.out  # train_pct=100 disclosure
