"""Reproduce the reference's train/eval loop ON ITS OWN CORPUS
(SURVEY.md §3.4; ``DatacatTrainerRunner.java:42-147``): read the committed
TEI + raw feature pairs, align labels (J1), expand the reference's own
CRF++ template, train a linear-chain model (averaged perceptron —
``stages/train.py`` — or the reference's actual estimator family, OWL-QN
elastic-net CRF — ``stages/crf_train.py``), and evaluate on the committed
``evaluation/`` split with per-label P/R/F1 in the reference's eval.txt
layout. Measured (BASELINE.md): CRF segmenter micro-F1 99.55 /
perceptron 95.60 vs the reference's committed 37–52; CRF body 97.88 ==
the shipped-Wapiti-weights decode.

The reference's committed baselines for this corpus family are micro-F1
37–52 across runs (BASELINE.md table); this loop is the engine's
apples-to-apples counterpart (same corpus, same feature columns, same
template file, different estimator).
"""

from __future__ import annotations

import os

import pyarrow as pa

REF_SEG = "/root/reference/resources/dataset/datacat-segmenter"
SEG_FIELDS = [f"f{i}" for i in range(33)]
SEG_LABELS = ["<front>", "<body>", "<back>", "<annex>", "<other>",
              "<header>", "<footnote>"]


def load_pairs(split: str, limit: int | None = None,
               base_dir: str = REF_SEG):
    """(doc_name, fseq-ready feature dicts, gold labels) per aligned doc of
    ``corpus`` or ``evaluation``. ``base_dir`` defaults to the reference's
    committed segmenter corpus; pass any directory in the same layout
    (``<base>/<split>/{tei,raw}`` — e.g. a ``create-training`` export
    parent) to train on user-corrected data."""
    from datacat_ray.pipelines.training import align_labels
    from datacat_ray.stages.tei import parse_reference_tei

    tei_dir = os.path.join(base_dir, split, "tei")
    raw_dir = os.path.join(base_dir, split, "raw")
    raws = set(os.listdir(raw_dir))
    out = []
    for t in sorted(os.listdir(tei_dir)):
        stem = t.replace(".training.datacat.tei.xml", "")
        # sorted + full-stem-plus-delimiter match: set iteration order is
        # per-process, and a bare prefix could hit another doc's raw file
        cand = sorted(r for r in raws if r.startswith(stem + "."))
        if not cand:
            continue
        tei_pairs = parse_reference_tei(
            open(os.path.join(tei_dir, t), encoding="utf-8", errors="replace").read()
        )
        labeled = [(line.split(" ")[0], lb) for line, lb in tei_pairs]
        feats = []
        first_toks = []
        for ln in open(os.path.join(raw_dir, cand[0]), encoding="utf-8",
                       errors="replace"):
            cols = ln.strip().split(" ")
            if len(cols) < 33:
                continue
            feats.append(dict(zip(SEG_FIELDS, cols[:33])))
            first_toks.append(cols[0])
        res = align_labels(first_toks, labeled)
        if res is None:
            continue
        gold = [lb for _, lb in res[0]]
        out.append((t, feats, gold))
        if limit and len(out) >= limit:
            break
    return out


def load_reference_template():
    from datacat_ray.stages.crf import parse_crfpp_template

    path = os.path.join(REF_SEG, "crfpp-templates", "datacat-segmenter.template")
    return parse_crfpp_template(open(path).read(), SEG_FIELDS)


REF_BODY = "/root/reference/resources/dataset/datacat-body-segmentation"
BODY_FIELDS = [f"f{i}" for i in range(24)]
BODY_LABELS = ["<entry>", "<title>", "<titledesc>", "<other>"]


def load_body_pairs(split: str, limit: int | None = None,
                    base_dir: str = REF_BODY, begin_states: bool = False):
    """Token-level (doc, feature dicts, gold labels) for the body model:
    TEI elements tokenized with the engine tokenizer, aligned (J1) against
    the raw feature file's token column. ``base_dir`` as in ``load_pairs``.

    ``begin_states=True`` prefixes each element's first token label with
    ``I-`` (the reference's begin-state convention,
    ``DatacatBodySegmentationParser.java:861-876``) — REQUIRED when the
    pairs train a deployable model, because ``body_label_runs`` splits
    entries only on ``I-``: a model that can't predict begin states
    collapses adjacent same-label elements into one span. The default
    (flat labels) is the evaluation convention, comparable with
    ``iob_to_flat``-collapsed Wapiti output."""
    from datacat_ray.functions.textkit import tokenize_layout
    from datacat_ray.pipelines.training import align_labels
    from datacat_ray.stages.tei import parse_reference_body_tei

    tei_dir = os.path.join(base_dir, split, "tei")
    raw_dir = os.path.join(base_dir, split, "raw")
    raws = set(os.listdir(raw_dir))
    out = []
    for t in sorted(os.listdir(tei_dir)):
        stem = t.split(".training")[0]
        cand = sorted(r for r in raws if r.startswith(stem))
        if not cand:
            continue
        labeled: list[tuple[str, str]] = []
        for label, content in parse_reference_body_tei(
            open(os.path.join(tei_dir, t), encoding="utf-8", errors="replace").read()
        ):
            lb = "<other>" if label == "<note>" else label
            first = True
            for tok in tokenize_layout(content):
                if not tok.isspace():
                    mark = "I-" + lb if (begin_states and first) else lb
                    labeled.append((tok, mark))
                    first = False
        feats = []
        toks = []
        for ln in open(os.path.join(raw_dir, cand[0]), encoding="utf-8",
                       errors="replace"):
            cols = ln.strip().split(" ")
            if len(cols) < 24:
                continue
            feats.append(dict(zip(BODY_FIELDS, cols[:24])))
            toks.append(cols[0])
        res = align_labels(toks, labeled)
        if res is None:
            continue
        out.append((t, feats, [lb for _, lb in res[0]]))
        if limit and len(out) >= limit:
            break
    return out


def load_body_template():
    from datacat_ray.stages.crf import parse_crfpp_template

    path = os.path.join(
        REF_BODY, "crfpp-templates", "datacat-body-segmentation.template"
    )
    return parse_crfpp_template(open(path).read(), BODY_FIELDS)


def reference_body_train_eval(
    epochs: int = 6, trainer: str = "perceptron", max_iter: int = 150
) -> tuple[pa.Table, str]:
    """Body-segmentation counterpart of ``reference_train_eval`` (14 train
    + 3 eval committed pairs; reference committed micro-F1 22–86 across
    corpus variants). ``trainer="crf"`` uses the reference's actual
    estimator family — OWL-QN elastic-net CRF (``stages/crf_train.py``) —
    instead of the perceptron; measured eval accuracy 97.88, exactly the
    accuracy of decoding with the reference's own shipped Wapiti weights
    (``reference_body_wapiti_eval``)."""
    import ray.data

    from datacat_ray.pipelines.training import eval_metrics, format_eval_report
    from datacat_ray.stages.train import _train_shard, _viterbi, expand_sequence

    templates = load_body_template()
    train = load_body_pairs("corpus")
    seqs = [(expand_sequence(f, templates), g) for _, f, g in train]
    if trainer == "crf":
        from datacat_ray.stages.crf_train import train_crf_lbfgs

        w, trans = train_crf_lbfgs(seqs, BODY_LABELS, max_iter=max_iter,
                                   shards=8)
    else:
        w, trans = _train_shard(seqs, BODY_LABELS, {}, {},
                                epochs_per_round=epochs)
    golds: list[str] = []
    preds: list[str] = []
    for _, feats, gold in load_body_pairs("evaluation"):
        pred = _viterbi(expand_sequence(feats, templates), BODY_LABELS, w, trans)
        golds.extend(gold)
        preds.extend(pred)
    pairs = ray.data.from_arrow(pa.table({"gold": golds, "pred": preds}))
    metrics = eval_metrics(pairs)
    return metrics, format_eval_report(metrics, accuracy_total=len(golds))


BODY_WAPITI_MODEL = (
    "/root/reference/resources/models/datacat-body-segmentation/model.wapiti"
)


def reference_body_wapiti_eval() -> tuple[pa.Table, str]:
    """WEIGHT-LEVEL parity: label the committed evaluation raw files with
    the reference's OWN shipped Wapiti weights (the exact model
    ``DatacatBodySegmentationParser.java:63-67`` loads), decoded by the
    engine's Wapiti reader/Viterbi (``stages/wapiti.py``) — no training
    involved. Gold comes from the committed TEI via the same alignment as
    the train/eval loop; IOB predictions are flattened to the engine's
    token labels (``<note>``→``<other>`` convention on the gold side)."""
    import ray.data

    from datacat_ray.pipelines.training import eval_metrics, format_eval_report
    from datacat_ray.stages.wapiti import (
        iob_to_flat,
        load_wapiti_model,
        wapiti_viterbi,
    )

    model = load_wapiti_model(BODY_WAPITI_MODEL)
    golds: list[str] = []
    preds: list[str] = []
    for _, feats, gold in load_body_pairs("evaluation"):
        rows = [[d[f] for f in BODY_FIELDS] for d in feats]
        pred = [iob_to_flat(lb) for lb in wapiti_viterbi(model, rows)]
        golds.extend(gold)
        preds.extend(pred)
    pairs = ray.data.from_arrow(pa.table({"gold": golds, "pred": preds}))
    metrics = eval_metrics(pairs)
    return metrics, format_eval_report(metrics, accuracy_total=len(golds))


def nfold_eval(
    n_folds: int = 5, docs: int = 40, epochs: int = 3
) -> list[float]:
    """A6 n-fold evaluation (``AbstractTrainer.runNFoldEvaluation`` via
    ``DatacatTrainerRunner.java:130-142``) on the reference corpus: docs
    assigned to folds by the seeded hash (``training.nfold_of``); each fold
    trains on the rest and evaluates on itself. Folds run as PARALLEL Ray
    tasks (independent train/eval pairs — the embarrassingly parallel
    outer loop the reference runs sequentially). Returns per-fold micro
    accuracy."""
    import ray as _ray

    from datacat_ray.pipelines.training import nfold_of
    from datacat_ray.stages.train import _train_shard, _viterbi, expand_sequence

    templates = load_reference_template()
    pairs = load_pairs("corpus", limit=docs)
    seqs = [
        (nfold_of(i, n_folds), expand_sequence(f, templates), g)
        for i, (_, f, g) in enumerate(pairs)
    ]
    # the expanded corpus is ~100 MB of feature strings — ship it through
    # the object store ONCE (shared zero-copy-ish by all fold tasks), never
    # inside the function closure (Ray caps pickled closures at 95 MiB)
    seqs_ref = _ray.put(seqs)

    @_ray.remote
    def _fold(k: int, seqs_obj) -> float:
        train = [(fs, g) for fid, fs, g in seqs_obj if fid != k]
        test = [(fs, g) for fid, fs, g in seqs_obj if fid == k]
        if not train or not test:
            return float("nan")
        w, trans = _train_shard(train, SEG_LABELS, {}, {},
                                epochs_per_round=epochs)
        tp = tot = 0
        for fs, gold in test:
            pred = _viterbi(fs, SEG_LABELS, w, trans)
            tp += sum(1 for a, b in zip(gold, pred) if a == b)
            tot += len(gold)
        return tp / tot if tot else float("nan")

    return _ray.get([_fold.remote(k, seqs_ref) for k in range(n_folds)])


def reference_train_eval(
    train_docs: int = 120, epochs: int = 6, shards: int = 1,
    trainer: str = "perceptron", max_iter: int = 1000,
) -> tuple[pa.Table, str]:
    """Train on the first ``train_docs`` aligned corpus documents, evaluate
    on the committed evaluation split. Returns (metrics table, eval.txt-
    style report). Requires the reference checkout.

    ``shards=1`` (default) is a plain sequential structured perceptron —
    the quality reference. ``shards>1`` switches to parallel parameter
    mixing (``train_parameter_mixing``): at web scale the per-epoch
    wall-time drops by the shard count at some accuracy cost per epoch —
    at THIS corpus size (tens of long sequences) the averaging dilutes the
    few per-shard updates, so sequential is both better and fast enough
    (measured: mixing 4×3 epochs collapsed to the majority class; one
    sequential pass reaches eval accuracy 0.88 vs the reference's
    committed 0.86–0.88 band).

    ``trainer="crf"`` trains with the reference's actual estimator family
    instead: OWL-QN elastic-net CRF (``stages/crf_train.py``) under the
    reference's hyperparameter scheme (epsilon/window/max-iterations,
    ``grobid-datacat.yaml:17-20``); ``epochs``/``shards`` are then
    ignored (the CRF shard count is fixed internally)."""
    import ray.data

    from datacat_ray.pipelines.training import eval_metrics, format_eval_report
    from datacat_ray.stages.train import (
        _train_shard,
        _viterbi,
        expand_sequence,
        train_parameter_mixing,
    )

    templates = load_reference_template()
    train = load_pairs("corpus", limit=train_docs)
    seqs = [(expand_sequence(f, templates), g) for _, f, g in train]
    if trainer == "crf":
        from datacat_ray.stages.crf_train import train_crf_lbfgs

        w, trans = train_crf_lbfgs(seqs, SEG_LABELS, max_iter=max_iter,
                                   shards=12)
    elif shards <= 1:
        w, trans = _train_shard(seqs, SEG_LABELS, {}, {},
                                epochs_per_round=epochs)
    else:
        w, trans = train_parameter_mixing(seqs, SEG_LABELS, epochs=epochs,
                                          shards=shards)

    golds: list[str] = []
    preds: list[str] = []
    for _, feats, gold in load_pairs("evaluation"):
        fseq = expand_sequence(feats, templates)
        pred = _viterbi(fseq, SEG_LABELS, w, trans)
        golds.extend(gold)
        preds.extend(pred)
    pairs = ray.data.from_arrow(pa.table({"gold": golds, "pred": preds}))
    metrics = eval_metrics(pairs)
    report = format_eval_report(metrics, accuracy_total=len(golds))
    return metrics, report
