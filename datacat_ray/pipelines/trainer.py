"""Trainer entry — the engine's ``DatacatTrainerRunner.main`` analogue
(SURVEY.md §3.4; ``DatacatTrainerRunner.java:42-147``): train a segmenter
or body model from a corpus directory in the reference's committed layout
(``<dir>/{tei,raw}`` — exactly what the ``create-training`` command
exports), with either estimator (averaged perceptron or the reference's
actual family, OWL-QN elastic-net CRF), the seeded train/eval split the
reference's gradle tasks apply (``build.gradle:163-168``), an eval.txt-
style report, and a self-contained JSON model artifact loadable back into
the decode path (``CRFModel``/``CRFDecoder``) — closing the full
model-improvement loop: extract → create-training → correct → train →
deploy.
"""

from __future__ import annotations

import json
import os

# reference checkout root: overridable because `train` is a user-facing
# deploy-loop command that must work wherever the reference lives (the
# /root/reference default matches the eval-harness convention)
REFERENCE_DIR = os.environ.get("DATACAT_REFERENCE_DIR", "/root/reference")

REF_TEMPLATES = {
    "segmenter": os.path.join(
        REFERENCE_DIR,
        "resources/dataset/datacat-segmenter/"
        "crfpp-templates/datacat-segmenter.template",
    ),
    "body": os.path.join(
        REFERENCE_DIR,
        "resources/dataset/datacat-body-segmentation/"
        "crfpp-templates/datacat-body-segmentation.template",
    ),
}
N_FIELDS = {"segmenter": 33, "body": 24}


def load_corpus(corpus_dir: str, model: str = "segmenter",
                limit: int | None = None):
    """(doc_name, feature dicts, gold labels) per aligned doc of a
    ``<dir>/{tei,raw}`` corpus (reference layout / create-training
    export). Body corpora load WITH ``I-`` begin states — a deployable
    body model must predict element starts or ``body_label_runs`` merges
    adjacent same-label entries."""
    from datacat_ray.pipelines.reference_eval import load_body_pairs, load_pairs

    if model == "segmenter":
        return load_pairs("", limit=limit, base_dir=corpus_dir)
    return load_body_pairs("", limit=limit, base_dir=corpus_dir,
                           begin_states=True)


def train_model(
    corpus_dir: str,
    model: str = "segmenter",
    trainer: str = "crf",
    template_path: str | None = None,
    train_pct: int = 90,
    seed: int = 42,
    epochs: int = 6,
    max_iter: int = 1000,
    shards: int = 8,
    checkpoint_dir: str | None = None,
) -> tuple[dict, str]:
    """Train from a corpus directory; returns (model artifact dict ready
    for ``save_model_json``, eval.txt-style report over the held-out
    split). Docs are assigned train/eval by the engine's seeded split
    (S11, ``training.split_of``); ``train_pct=100`` trains on everything
    and reports on the training docs themselves."""
    import pyarrow as pa
    import ray.data

    from datacat_ray.pipelines.training import (
        eval_metrics,
        format_eval_report,
        split_of,
    )
    from datacat_ray.stages.crf import parse_crfpp_template
    from datacat_ray.stages.train import _viterbi, expand_sequence

    fields = [f"f{i}" for i in range(N_FIELDS[model])]
    template_path = template_path or REF_TEMPLATES[model]
    if not os.path.exists(template_path):
        raise FileNotFoundError(
            f"CRF++ template not found: {template_path}. Pass --template "
            "explicitly, or point DATACAT_REFERENCE_DIR at a "
            "grobid-datacat checkout (default /root/reference)."
        )
    template_text = open(template_path).read()
    templates = parse_crfpp_template(template_text, fields)

    docs = load_corpus(corpus_dir, model)
    if not docs:
        raise ValueError(f"no aligned tei/raw pairs under {corpus_dir}")
    # labels discovered from the data, like the reference trainer
    labels = sorted({lb for _, _, gold in docs for lb in gold})
    train_docs = [
        d for i, d in enumerate(docs)
        if train_pct >= 100 or split_of(i, train_pct, seed) == "train"
    ]
    eval_docs = [
        d for i, d in enumerate(docs)
        if train_pct >= 100 or split_of(i, train_pct, seed) != "train"
    ]
    # disclosed, never silent: with train_pct=100 — or a small corpus the
    # seeded split happens to put entirely in train — the report describes
    # TRAINING accuracy, not held-out quality
    eval_on_train = not eval_docs or train_pct >= 100
    if not eval_docs:
        eval_docs = train_docs
    seqs = [(expand_sequence(f, templates), g) for _, f, g in train_docs]

    if trainer == "crf":
        from datacat_ray.stages.crf_train import train_crf_lbfgs

        w, trans = train_crf_lbfgs(seqs, labels, max_iter=max_iter,
                                   shards=shards,
                                   checkpoint_dir=checkpoint_dir)
    else:
        from datacat_ray.stages.train import _train_shard

        w, trans = _train_shard(seqs, labels, {}, {},
                                epochs_per_round=epochs)

    golds: list[str] = []
    preds: list[str] = []
    for _, feats, gold in eval_docs:
        pred = _viterbi(expand_sequence(feats, templates), labels, w, trans)
        golds.extend(gold)
        preds.extend(pred)
    pairs = ray.data.from_arrow(pa.table({"gold": golds, "pred": preds}))
    report = format_eval_report(eval_metrics(pairs),
                                accuracy_total=len(golds))
    if eval_on_train:
        report = ("NOTE: evaluated on the TRAINING documents (no held-out "
                  "split) — not an estimate of generalization\n" + report)

    artifact = {
        "format": "datacat-ray-crf-v1",
        "model": model,
        "trainer": trainer,
        "labels": labels,
        "n_fields": N_FIELDS[model],
        "template": template_text,
        "weights": w,
        "transitions": [[a, b, v] for (a, b), v in sorted(trans.items())],
        "train_docs": len(train_docs),
        "eval_docs": len(eval_docs),
        "eval_on_train": eval_on_train,
        "train_pct": train_pct,
        "seed": seed,
    }
    return artifact, report


def save_model_json(path: str, artifact: dict) -> str:
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(artifact, fh)
    os.replace(tmp, path)  # atomic publish, same as the manifest writers
    return path


def load_model_json(path: str):
    """Model artifact → decode-ready ``CRFDecoder`` (the object the
    cascade stages hold per worker)."""
    from datacat_ray.stages.crf import CRFDecoder, CRFModel, parse_crfpp_template

    with open(path, encoding="utf-8") as fh:
        art = json.load(fh)
    if art.get("format") != "datacat-ray-crf-v1":
        raise ValueError(f"not a datacat-ray model artifact: {path}")
    fields = [f"f{i}" for i in range(art["n_fields"])]
    model = CRFModel(
        labels=tuple(art["labels"]),
        templates=parse_crfpp_template(art["template"], fields),
        weights=art["weights"],
        transitions={(a, b): v for a, b, v in art["transitions"]},
    )
    return CRFDecoder(model)
