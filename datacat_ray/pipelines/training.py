"""Trainer-side operators (SURVEY.md S11/O3 split, J1 alignment join,
A5 evaluation metrics, A6 n-fold).

Model *training* itself is out of scope (frozen deterministic models, see
``stages/models.py``); these are the data-pipeline pieces around it, each
Ray-Data-native and (where the semantics are relational) DuckDB-checkable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

# ---------------------------------------------------------------------------
# S11/O3 — seeded train/eval split
# ---------------------------------------------------------------------------

_KNUTH = 2654435761  # Knuth multiplicative hash constant
_M32 = 1 << 32


def split_of(doc_id: int, train_pct: int = 80, seed: int = 42) -> str:
    """Deterministic pseudo-random split. The reference splits with UNSEEDED
    ``Math.random() <= splitRatio`` per document
    (``DatacatSegmenterTrainer.java:208-211``) — nondeterministic across
    runs; per SURVEY.md O3 the engine fixes a seed. The multiplicative-hash
    arithmetic is chosen to be reproducible in ANSI SQL (integer ops only),
    so the split itself is oracle-checkable."""
    h = ((doc_id + seed) * _KNUTH) % _M32
    return "train" if (h % 100) < train_pct else "eval"


def train_eval_split(sf_dir: str, train_pct: int = 80, seed: int = 42):
    """(doc_id, split) over the documents table — no shuffle. Exact-integer
    hash arithmetic (Python bigint ↔ SQL HUGEINT) so the assignment is
    overflow-free at any doc_id; at 10^12-row scale the same formula runs
    vectorized in uint64 with an explicit wrap convention."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def _split(t: pa.Table) -> pa.Table:
        split = [
            split_of(d, train_pct, seed) for d in t["doc_id"].to_pylist()
        ]
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "split": pa.array(split, type=pa.string())}
        )

    return ds.map_batches(_split, batch_format="pyarrow")


def train_eval_split_sql(train_pct: int = 80, seed: int = 42) -> str:
    return f"""
        SELECT doc_id,
               CASE WHEN ((CAST(doc_id AS HUGEINT) + {seed}) * {_KNUTH})
                         % {_M32} % 100 < {train_pct}
                    THEN 'train' ELSE 'eval' END AS split
        FROM documents
    """


# ---------------------------------------------------------------------------
# A6 — n-fold assignment
# ---------------------------------------------------------------------------


def nfold_of(doc_id: int, n_folds: int = 10, seed: int = 42) -> int:
    return (((doc_id + seed) * _KNUTH) % _M32) % n_folds


# ---------------------------------------------------------------------------
# J1 — token↔label alignment join (trainer corpus assembly)
# ---------------------------------------------------------------------------

RESYNC_WINDOW = 5  # candidates scanned on a mismatch
MAX_CONSECUTIVE_INVALID = 20  # abort the document beyond this
MAX_INVALID_PER_DOC = 10  # drop the document's pair set beyond this


def normalize_for_alignment(tok: str) -> str:
    """``UnicodeUtil.normaliseTextAndRemoveSpaces`` analogue
    (``DatacatSegmenterTrainer.java:163-176``): NFKC + strip all spaces."""
    import unicodedata

    return "".join(unicodedata.normalize("NFKC", tok).split())


def align_labels(
    feature_tokens: list[str], labeled: list[tuple[str, str]]
) -> tuple[list[tuple[str, str]], int] | None:
    """Positional as-of merge of raw feature-file tokens against
    TEI-derived ``(token, label)`` pairs — the reference trainer's
    tolerant alignment (``DatacatSegmenterTrainer.java:150-215``):

    - advance a candidate window of ``RESYNC_WINDOW`` labeled tokens;
    - on a miss, reuse the previous label and count one invalid;
    - abort after ``MAX_CONSECUTIVE_INVALID`` consecutive misses;
    - return ``None`` (drop the document) when total invalids ≥
      ``MAX_INVALID_PER_DOC``.

    Returns ``(aligned [(token, label)], n_invalid)`` or ``None``. Runs
    row-local inside ``map_batches`` — both sequences live on the row, so
    this is never a distributed join (SURVEY.md §2.4 J1)."""
    aligned: list[tuple[str, str]] = []
    j = 0
    invalid = 0
    consecutive = 0
    prev_label = labeled[0][1] if labeled else "<other>"
    for tok in feature_tokens:
        want = normalize_for_alignment(tok)
        hit = None
        for k in range(j, min(j + RESYNC_WINDOW, len(labeled))):
            if normalize_for_alignment(labeled[k][0]) == want:
                hit = k
                break
        if hit is None:
            aligned.append((tok, prev_label))
            invalid += 1
            consecutive += 1
            if consecutive > MAX_CONSECUTIVE_INVALID:
                return None
        else:
            label = labeled[hit][1]
            aligned.append((tok, label))
            prev_label = label
            j = hit + 1
            consecutive = 0
    if invalid >= MAX_INVALID_PER_DOC:
        return None
    return aligned, invalid


# ---------------------------------------------------------------------------
# A5 — evaluation metrics (per-label accuracy/P/R/F1 + micro average)
# ---------------------------------------------------------------------------


def eval_metrics(
    pairs: "ray.data.Dataset", labels: tuple[str, ...] | None = None
) -> pa.Table:
    """Per-label precision/recall/F1 over a (gold, pred) Dataset, plus a
    ``__micro__`` row — the engine analogue of the reference's committed
    ``eval.txt`` artifacts (``AbstractTrainer.runEvaluation`` via
    ``DatacatTrainerRunner.java:120-146``).

    Shape: one vectorized partial-count ``map_batches`` (tp/fp/fn per label
    per batch) → small ``groupby(label).sum`` → driver-side ratio math on
    the tiny per-label table. Ratios are scaled to int micros so the values
    are hash-stable (same convention as relational.scale_to_int64)."""

    def _partials(t: pa.Table) -> pa.Table:
        import collections

        tp: collections.Counter = collections.Counter()
        fp: collections.Counter = collections.Counter()
        fn: collections.Counter = collections.Counter()
        for g, p in zip(t["gold"].to_pylist(), t["pred"].to_pylist()):
            if g == p:
                tp[g] += 1
            else:
                fp[p] += 1
                fn[g] += 1
        labels = sorted(set(tp) | set(fp) | set(fn))
        return pa.Table.from_pydict(
            {
                "label": labels,
                "tp": [tp[l] for l in labels],
                "fp": [fp[l] for l in labels],
                "fn": [fn[l] for l in labels],
            }
        )

    counts = (
        pairs.map_batches(_partials, batch_format="pyarrow")
        .groupby("label")
        .aggregate(
            Sum("tp", alias_name="tp"),
            Sum("fp", alias_name="fp"),
            Sum("fn", alias_name="fn"),
        )
        .to_pandas()
    )
    if labels:
        # emit zero-count rows for expected-but-unobserved labels so the
        # row set matches oracles that enumerate the full label space
        import pandas as pd

        missing = [l for l in labels if l not in set(counts["label"])]
        if missing:
            counts = pd.concat(
                [counts, pd.DataFrame(
                    {"label": missing, "tp": 0, "fp": 0, "fn": 0})],
                ignore_index=True,
            )

    def _row(label, tp, fp, fn):
        import math

        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        # floor, not round: both sides compute bit-identical IEEE doubles
        # (same integer ratios), so floor is deterministic while round
        # diverges on exact .5 boundaries (banker's vs half-away)
        return {
            "label": label,
            "tp": int(tp), "fp": int(fp), "fn": int(fn),
            "precision_micros": math.floor(prec * 1e6),
            "recall_micros": math.floor(rec * 1e6),
            "f1_micros": math.floor(f1 * 1e6),
        }

    rows = [
        _row(r.label, r.tp, r.fp, r.fn)
        for r in counts.sort_values("label").itertuples()
    ]
    rows.append(
        _row("__micro__", counts.tp.sum(), counts.fp.sum(), counts.fn.sum())
    )
    return pa.Table.from_pydict(
        {k: [r[k] for r in rows] for k in rows[0]},
        schema=pa.schema(
            [("label", pa.string()), ("tp", pa.int64()), ("fp", pa.int64()),
             ("fn", pa.int64()), ("precision_micros", pa.int64()),
             ("recall_micros", pa.int64()), ("f1_micros", pa.int64())]
        ),
    )


def format_eval_report(metrics: pa.Table, accuracy_total: int | None = None) -> str:
    """Render metrics in the reference's committed ``eval.txt`` layout
    (``resources/models/*/prev_models/*/eval.txt``): a ``Field-level
    results`` table with per-label precision/recall/f1/support and micro
    averages. Accuracy requires the total token count; omitted rows print
    a dash."""
    rows = metrics.to_pylist()
    per_label = [r for r in rows if r["label"] != "__micro__"]
    micro = next((r for r in rows if r["label"] == "__micro__"), None)

    def fmt(v_micros: int) -> str:
        return f"{v_micros / 10_000:.2f}"

    out = ["===== Field-level results =====", "",
           f"{'label':20s} {'accuracy':12s} {'precision':12s} "
           f"{'recall':12s} {'f1':12s} {'support':s}", ""]
    for r in per_label:
        support = r["tp"] + r["fn"]
        if accuracy_total:
            acc = f"{100 * (accuracy_total - r['fp'] - r['fn']) / accuracy_total:.2f}"
        else:
            acc = "-"
        out.append(
            f"{r['label']:20s} {acc:12s} {fmt(r['precision_micros']):12s} "
            f"{fmt(r['recall_micros']):12s} {fmt(r['f1_micros']):12s} "
            f"{support}"
        )
    if micro:
        support = micro["tp"] + micro["fn"]
        acc = (
            f"{100 * micro['tp'] / accuracy_total:.2f}" if accuracy_total else "-"
        )
        out += ["",
                f"{'all (micro avg.)':20s} {acc:12s} "
                f"{fmt(micro['precision_micros']):12s} "
                f"{fmt(micro['recall_micros']):12s} "
                f"{fmt(micro['f1_micros']):12s} {support}"]
    return "\n".join(out) + "\n"


def quality_band_eval(sf_dir: str) -> pa.Table:
    """A5 demo with a SQL oracle: gold = length band at 150 chars, pred =
    length band at 200 chars (both bands computable identically in SQL, so
    the metric AGGREGATION — the operator under test — is oracle-checked
    end to end)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def _bands(t: pa.Table) -> pa.Table:
        gold = pc.if_else(
            pc.greater_equal(t["n_chars"], pa.scalar(150, pa.int64())),
            pa.scalar("long"), pa.scalar("short"),
        )
        pred = pc.if_else(
            pc.greater_equal(t["n_chars"], pa.scalar(200, pa.int64())),
            pa.scalar("long"), pa.scalar("short"),
        )
        return pa.Table.from_pydict({"gold": gold, "pred": pred})

    return eval_metrics(
        ds.map_batches(_bands, batch_format="pyarrow"), labels=("long", "short")
    )


QUALITY_BAND_EVAL_SQL = """
    WITH t AS (
        SELECT CASE WHEN n_chars >= 150 THEN 'long' ELSE 'short' END AS gold,
               CASE WHEN n_chars >= 200 THEN 'long' ELSE 'short' END AS pred
        FROM documents
    ),
    labels AS (
        SELECT label FROM (VALUES ('long'), ('short')) v(label)
        UNION ALL SELECT '__micro__'
    ),
    counts AS (
        SELECT l.label,
               SUM(CASE WHEN (l.label = '__micro__' OR t.pred = l.label)
                         AND t.gold = t.pred THEN 1 ELSE 0 END) AS tp,
               SUM(CASE WHEN (l.label = '__micro__' OR t.pred = l.label)
                         AND t.gold <> t.pred THEN 1 ELSE 0 END) AS fp,
               SUM(CASE WHEN (l.label = '__micro__' OR t.gold = l.label)
                         AND t.gold <> t.pred THEN 1 ELSE 0 END) AS fn
        FROM labels l, t
        GROUP BY l.label
    )
    SELECT label,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CAST(FLOOR(CASE WHEN tp+fp=0 THEN 0 ELSE tp*1.0/(tp+fp) END * 1000000) AS BIGINT) AS precision_micros,
           CAST(FLOOR(CASE WHEN tp+fn=0 THEN 0 ELSE tp*1.0/(tp+fn) END * 1000000) AS BIGINT) AS recall_micros,
           CAST(FLOOR(CASE WHEN tp+fp=0 OR tp+fn=0 OR tp=0 THEN 0 ELSE
                2.0*(tp*1.0/(tp+fp))*(tp*1.0/(tp+fn))/((tp*1.0/(tp+fp))+(tp*1.0/(tp+fn)))
                END * 1000000) AS BIGINT) AS f1_micros
    FROM counts
"""
