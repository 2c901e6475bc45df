"""Per-token features for the third cascade level: lexical-entry layout
(the north-star's "segmentation → catalogue-entry → lexical-entry" model
chain; the reference stubs this level as ``EntryItem``
(``src/main/java/org/grobid/core/data/EntryItem.java:20-31``) — label→token
field holders with no logic — so the label set below is the engine's
concretization of that stub for sale-catalogue entries):

    <num>       leading lot number        ("12")
    <category>  object category           ("Monnaies d'Italie")
    <desc>      free description          ("écu et divisions")
    <count>     piece count               ("39 pièces")
    <material>  material code             ("AR", "AV", ...)
    <other>     punctuation / connectives

Features are entry-local (position bins within the entry span, neighbor
punctuation), computed per non-space token. Same generic CRF machinery as
the other two levels (templates → weights → Viterbi).
"""

from __future__ import annotations

from datacat_ray.functions.textkit import (
    capitalisation_class,
    digit_class,
    linear_scaling,
    punct_type,
)

NBBINS_ENTRY = 5


def featurize_entry_tokens(
    tokens: list[str], start: int, end: int
) -> tuple[list[dict], list[int]]:
    """Tokens of one entry span [start, end) → (feature dicts, absolute
    token indices); whitespace tokens skipped (re-inserted downstream by
    the same J2 resync convention as the body level)."""
    idx = [t for t in range(start, end) if not tokens[t].isspace()]
    n = len(idx)
    feats: list[dict] = []
    seen_colon = 0
    for pos, t in enumerate(idx):
        tok = tokens[t]
        prev_tok = tokens[idx[pos - 1]] if pos > 0 else ""
        next_tok = tokens[idx[pos + 1]] if pos + 1 < n else ""
        feats.append(
            {
                "lowercase": tok.lower(),
                "digit": digit_class(tok),
                "capitalisation": capitalisation_class(tok),
                "punct_type": punct_type(tok),
                "prev_punct": punct_type(prev_tok) if prev_tok else "_NONE_",
                "next_lower": next_tok.lower() if next_tok else "_NONE_",
                "entry_position": linear_scaling(pos, n, NBBINS_ENTRY),
                # the category/description boundary marker in catalogue
                # grammar is the colon — a cross-token feature the local
                # window can't see (document-local running state, same
                # pattern as the reference's font-transition features)
                "seen_colon": seen_colon,
            }
        )
        if tok == ":":
            seen_colon = 1
    return feats, idx
