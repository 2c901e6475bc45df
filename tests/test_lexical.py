"""Third cascade level: lexical-entry layout model (the north-star's
segmentation → catalogue-entry → lexical-entry chain; the reference stubs
this level as ``EntryItem``, ``EntryItem.java:20-31``)."""

from __future__ import annotations

from datacat_ray.functions.textkit import tokenize_layout
from datacat_ray.stages.crf import CRFDecoder
from datacat_ray.stages.lexical_features import featurize_entry_tokens
from datacat_ray.stages.models import LEXICAL_MODEL


def _label_tokens(line: str) -> list[tuple[str, str]]:
    toks = tokenize_layout(line)
    feats, idx = featurize_entry_tokens(toks, 0, len(toks))
    dec = CRFDecoder(LEXICAL_MODEL)
    return [(toks[t], lb) for t, lb in zip(idx, dec.decode(feats))]


def test_canonical_entry_grammar():
    got = _label_tokens("12. Monnaies d'Italie: écu et divisions ; 39 pièces. AR.")
    by_label: dict[str, list[str]] = {}
    for tok, lb in got:
        by_label.setdefault(lb, []).append(tok)
    assert by_label["<num>"] == ["12"]
    assert by_label["<category>"] == ["Monnaies", "d", "'", "Italie"]
    assert by_label["<desc>"][:3] == ["écu", "et", "divisions"]
    assert by_label["<count>"] == ["39", "pièces"]
    assert by_label["<material>"] == ["AR"]


def test_singular_count_noun():
    got = dict(_label_tokens("7. Jetons et méreaux: oboles ; 1 pièce. PB."))
    assert got["1"] == "<count>" and got["pièce"] == "<count>"
    assert got["PB"] == "<material>"
    assert got["Jetons"] == "<category>"


def test_category_keeps_lowercase_connectives_before_colon():
    got = dict(_label_tokens("4. Bronzes antiques: deniers variés ; 80 pièces. EL."))
    assert got["antiques"] == "<category>"  # lowercase but pre-colon
    assert got["deniers"] == "<desc>"


def test_flagship_emits_lexical_spans(ray_session, tmp_path):
    import ray.data

    from datacat_ray.fixtures import write_pages_parquet
    from datacat_ray.pipelines.extract import extract_pages

    d = str(tmp_path / "pages")
    write_pages_parquet(d, n_urls=20, seed=21, rows_per_file=10)
    rows = extract_pages(d).take_all()
    labeled = [r for r in rows if any(e["label"] == "<entry>" for e in r["entries"])]
    assert labeled, "no entry-bearing docs in fixture"
    for r in labeled:
        labels = {s["label"] for s in r["lexical"]}
        assert "<num>" in labels and "<count>" in labels, r["url"]
        # spans sit inside the token stream
        for s in r["lexical"]:
            assert 0 <= s["start"] < s["end"] <= r["n_tokens"]
