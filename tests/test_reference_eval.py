"""Train/eval reproduction on the reference's own corpus (SURVEY.md §3.4).

Small config for test runtime; the full run (120 docs, 4 epochs) reaches
micro F1 95.3 vs the reference's committed 37–52 band — see BASELINE.md.
"""

from __future__ import annotations

import os

import pytest

REF = "/root/reference/resources/dataset/datacat-segmenter"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_perceptron_fits_reference_documents(ray_session):
    """Fit check on a handful of real corpus documents: the trained model
    must reproduce >=90% of its own training labels (cross-family
    GENERALIZATION needs ~100+ train docs — that full run reaches micro
    F1 95.3 on the committed evaluation split, recorded in BASELINE.md;
    too slow for the suite)."""
    from datacat_ray.pipelines.reference_eval import (
        SEG_LABELS,
        load_pairs,
        load_reference_template,
    )
    from datacat_ray.stages.train import _train_shard, _viterbi, expand_sequence

    templates = load_reference_template()
    train = load_pairs("corpus", limit=8)
    seqs = [(expand_sequence(f, templates), g) for _, f, g in train]
    w, trans = _train_shard(seqs, SEG_LABELS, {}, {}, epochs_per_round=3)
    tp = tot = 0
    for fseq, gold in seqs:
        pred = _viterbi(fseq, SEG_LABELS, w, trans)
        tp += sum(1 for a, b in zip(gold, pred) if a == b)
        tot += len(gold)
    assert tp / tot >= 0.9


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_parameter_mixing_runs(ray_session):
    """The parallel path trains and decodes without error (quality at this
    tiny scale is not asserted — see reference_train_eval docstring)."""
    from datacat_ray.pipelines.reference_eval import (
        SEG_LABELS,
        load_pairs,
        load_reference_template,
    )
    from datacat_ray.stages.train import expand_sequence, train_parameter_mixing

    templates = load_reference_template()
    train = load_pairs("corpus", limit=6)
    seqs = [(expand_sequence(f, templates), g) for _, f, g in train]
    w, trans = train_parameter_mixing(seqs, SEG_LABELS, epochs=2, shards=3)
    assert w and trans


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_body_model_train_eval(ray_session):
    """Body-segmentation reproduction: small corpus (11 aligned pairs), so
    the full loop runs in-suite; must beat the reference's largest-eval
    committed micro F1 (57.93)."""
    from datacat_ray.pipelines.reference_eval import reference_body_train_eval

    metrics, report = reference_body_train_eval(epochs=4)
    rows = {r["label"]: r for r in metrics.to_pylist()}
    micro = rows["__micro__"]
    f1 = micro["f1_micros"] / 1e6
    assert f1 >= 0.60, report


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_body_model_crf_trainer(ray_session):
    """The reference's actual estimator family — OWL-QN elastic-net CRF —
    on the real body corpus; even at a short iteration budget it must
    clear the reference's largest-eval committed micro F1 (57.93). (The
    full 150-iteration run reaches 97.88 — the same accuracy as decoding
    with the reference's own shipped Wapiti weights; recorded in
    BASELINE.md.)"""
    from datacat_ray.pipelines.reference_eval import (
        BODY_LABELS,
        load_body_pairs,
        load_body_template,
    )
    from datacat_ray.stages.crf_train import train_crf_lbfgs
    from datacat_ray.stages.train import _viterbi, expand_sequence

    templates = load_body_template()
    train = load_body_pairs("corpus")
    seqs = [(expand_sequence(f, templates), g) for _, f, g in train]
    w, trans = train_crf_lbfgs(seqs, BODY_LABELS, max_iter=40, shards=4)
    tp = tot = 0
    for _, feats, gold in load_body_pairs("evaluation"):
        pred = _viterbi(expand_sequence(feats, templates), BODY_LABELS,
                        w, trans)
        tp += sum(1 for a, b in zip(gold, pred) if a == b)
        tot += len(gold)
    assert tot and tp / tot >= 0.70, f"crf eval accuracy {tp}/{tot}"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_nfold_parallel(ray_session):
    """A6 n-fold on real corpus docs: folds run as parallel Ray tasks and
    each clears the trivial floor."""
    from datacat_ray.pipelines.reference_eval import nfold_eval

    accs = nfold_eval(n_folds=2, docs=10, epochs=2)
    assert len(accs) == 2
    assert all(a > 0.3 for a in accs), accs
