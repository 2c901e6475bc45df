"""Composed corpus-prep chain (gate -> exact dedup -> per-lang rollup)
must agree with the composition of its standalone stages."""

from datacat_ray.pipelines.dedup_ops import exact_dedup
from datacat_ray.pipelines.text_analysis import (
    corpus_gate,
    corpus_prep,
    token_count,
)

SF = "/root/testdata/sf0.001"


def test_corpus_prep_composes(ray_session):
    import pyarrow.parquet as pq

    prep = {r["lang"]: (r["n_docs"], r["n_tokens"])
            for r in corpus_prep(SF).take_all()}
    kept = {r["doc_id"] for r in corpus_gate(SF).take_all() if r["keep"]}
    toks = {r["doc_id"]: r["n_tokens"] for r in token_count(SF).take_all()}
    # exact dedup among the KEPT docs only (prep gates before dedup, so
    # recompute survivors over the gated subset here)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    first: dict[str, int] = {}
    lang_of = {}
    for d, t, lang in sorted(
        zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist(),
            docs["lang"].to_pylist())
    ):
        lang_of[d] = lang
        if d in kept and (t not in first):
            first[t] = d
    surv = set(first.values())
    want: dict[str, list[int]] = {}
    for d in surv:
        n_docs, n_toks = want.get(lang_of[d], (0, 0))
        want[lang_of[d]] = (n_docs + 1, n_toks + toks[d])
    assert prep == want
