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


def test_train_crf_estimator_on_export(exported_corpus, ray_session):
    """The CRF estimator path over an exported corpus: short budget, must
    fit the (machine-labeled, hence consistent) corpus well."""
    artifact, report = train_model(
        exported_corpus, model="segmenter", trainer="crf",
        train_pct=100, max_iter=25, shards=4,
    )
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
