"""Frozen deterministic CRF models for the two-stage cascade.

The reference ships Wapiti weight blobs (segmenter blob missing from the
repo's LFS store; body model at
``resources/models/datacat-body-segmentation/model.wapiti``). Per SURVEY.md
§7.0 this engine ships its own small frozen models expressed as explicit
feature→weight rules run through the real CRF machinery (template expansion +
transitions + Viterbi). They are hand-set to recover the sale-catalogue
structure of the fixture corpus (front matter / numbered entries / back
matter), and they are DATA: the golden outputs are frozen against exactly
these weights.

Label sets mirror the reference:
- segmenter zones ``<front> <body> <back> <annex> <other>``
  (``DatacatLabels.java:13-21``)
- body labels ``<entry> <title> <titledesc> <other>`` with ``I-`` begin
  states (``DatacatBodySegmentationParser.java:861-876``)
"""

from __future__ import annotations

from datacat_ray.stages.crf import CRFModel

# ---------------------------------------------------------------------------
# segmenter model (per-line zoning)
# ---------------------------------------------------------------------------

SEG_LABELS = ("<front>", "<body>", "<back>", "<annex>", "<other>")

SEG_TEMPLATES = (
    ("Ulow", ((0, "lowercase"),)),
    ("Ulow-1", ((-1, "lowercase"),)),
    ("Udig", ((0, "digit"),)),
    ("Udig+1", ((1, "digit"),)),
    ("Upos", ((0, "rel_doc_position"),)),
    ("Ucap", ((0, "capitalisation"),)),
    ("Umonth", ((0, "month"),)),
    ("Uyear", ((0, "year"),)),
    ("Uhttp", ((0, "http"),)),
    ("Urep", ((0, "repetitive_pattern"),)),
    ("Ubold", ((0, "bold"),)),
    ("Upunc", ((0, "punct_type"),)),
    ("Udigpos", ((0, "digit"), (0, "rel_doc_position"))),
)


def _seg_weights() -> dict[str, dict[str, float]]:
    w: dict[str, dict[str, float]] = {}
    # front-matter vocabulary (fixture front lines: "Vente du …",
    # "COLLECTION", "CONDITIONS DE LA VENTE", "Exposition publique …")
    for word, wt in [
        ("vente", 2.0), ("collection", 2.5), ("conditions", 3.0),
        ("exposition", 2.5), ("catalogue", 1.5), ("antiquités", 1.5),
        ("la", 1.0),
    ]:
        w[f"Ulow:{word}"] = {"<front>": wt}
    # back-matter vocabulary ("TABLE DES MATIÈRES", "Imprimerie …",
    # index lines "Monnaies ..... page 3")
    for word, wt in [("table", 3.0), ("imprimerie", 3.5)]:
        w[f"Ulow:{word}"] = {"<back>": wt}
    w["Ulow-1:table"] = {"<back>": 1.0}
    # annex vocabulary (plates sections in catalogues)
    for word, wt in [("planches", 3.0), ("planche", 2.5)]:
        w[f"Ulow:{word}"] = {"<annex>": wt}
    # numbered entry lines ("12. Monnaies d'Italie: …") are the body's
    # signature; digit-led lines in mid-document doubly so
    w["Udig:ALLDIGIT"] = {"<body>": 2.5, "<front>": -0.5}
    for b in range(2, 11):
        w[f"Udigpos:ALLDIGIT|{b}"] = {"<body>": 1.0}
    # document-position prior (NBBINS_POSITION=12 → bins 0..11)
    w["Upos:0"] = {"<front>": 2.0}
    w["Upos:1"] = {"<front>": 0.8, "<body>": 0.3}
    for b in range(3, 10):
        w[f"Upos:{b}"] = {"<body>": 0.6}
    w["Upos:10"] = {"<back>": 0.4, "<body>": 0.3}
    w["Upos:11"] = {"<back>": 1.2}
    # front matter is date-rich
    w["Umonth:1"] = {"<front>": 0.8}
    w["Uyear:1"] = {"<front>": 0.4, "<back>": 0.4}
    # links / repeated header-footer skeletons that survived the DOM strip
    w["Uhttp:1"] = {"<other>": 2.5}
    w["Urep:1"] = {"<other>": 2.0}
    return w


SEG_TRANSITIONS = {
    ("<front>", "<body>"): 0.5,
    ("<body>", "<back>"): 0.5,
    ("<body>", "<annex>"): 0.3,
    ("<annex>", "<back>"): 0.3,
    ("<body>", "<front>"): -2.0,
    ("<back>", "<front>"): -2.0,
    ("<back>", "<body>"): -1.5,
    ("<annex>", "<front>"): -2.0,
}

SEGMENTER_MODEL = CRFModel(
    labels=SEG_LABELS,
    templates=SEG_TEMPLATES,
    weights=_seg_weights(),
    transitions=SEG_TRANSITIONS,
    init={"<front>": 1.5, "<back>": -1.0},
    sticky=1.8,
)

# ---------------------------------------------------------------------------
# body model (per-token catalogue-entry structure) — begin/inside states
# ---------------------------------------------------------------------------

BODY_BASE_LABELS = ("<entry>", "<title>", "<titledesc>", "<other>")
BODY_LABELS = tuple(
    s for lb in BODY_BASE_LABELS for s in (f"I-{lb}", lb)
)  # I-<x> = begin, <x> = inside

BODY_TEMPLATES = (
    ("Ulow", ((0, "lowercase"),)),
    ("Udig", ((0, "digit"),)),
    ("Ucap", ((0, "capitalisation"),)),
    ("Uline", ((0, "line_status"),)),
    ("Upunc", ((0, "punct_type"),)),
    ("Upunc+1", ((1, "punct_type"),)),
    ("Ulinedig", ((0, "line_status"), (0, "digit"))),
    ("Ulinedig+1", ((0, "line_status"), (0, "digit"), (1, "punct_type"))),
    ("Ubold", ((0, "bold"),)),
    ("Upos", ((0, "rel_doc_position"),)),
)


def _body_weights() -> dict[str, dict[str, float]]:
    w: dict[str, dict[str, float]] = {}
    # an entry begins at a line-start number followed by a dot:
    # "12. Monnaies d'Italie: …"
    w["Ulinedig:LINESTART|ALLDIGIT"] = {"I-<entry>": 3.0}
    w["Ulinedig+1:LINESTART|ALLDIGIT|DOT"] = {"I-<entry>": 2.0}
    # headings: all-caps tokens, bold, early in the body
    w["Ucap:ALLCAP"] = {"<title>": 0.8, "I-<title>": 0.8}
    w["Ubold:1"] = {"<title>": 0.6, "I-<title>": 0.6}
    w["Upos:0"] = {"<title>": 0.5, "I-<title>": 0.5}
    # descriptive run after a title
    w["Ucap:INITCAP"] = {"<titledesc>": 0.2}
    # inside continuation prior: most body text is entry text
    w["Ucap:NOCAPS"] = {"<entry>": 0.4}
    w["Udig:NODIGIT"] = {"<entry>": 0.1}
    return w


def _body_transitions() -> dict[tuple[str, str], float]:
    t: dict[tuple[str, str], float] = {}
    for lb in BODY_BASE_LABELS:
        t[(f"I-{lb}", lb)] = 2.0  # begin → inside of same label
        t[(lb, lb)] = 2.0  # sticky inside
        t[(f"I-{lb}", f"I-{lb}")] = -1.0  # discourage begin-begin runs
        for other in BODY_BASE_LABELS:
            if other != lb:
                # label change requires passing through a begin state
                t[(lb, other)] = -8.0
                t[(f"I-{lb}", other)] = -8.0
                t[(lb, f"I-{other}")] = 0.1
                t[(f"I-{lb}", f"I-{other}")] = -0.5
    return t


BODY_MODEL = CRFModel(
    labels=BODY_LABELS,
    templates=BODY_TEMPLATES,
    weights=_body_weights(),
    transitions=_body_transitions(),
    # a sequence must open with a begin state
    init={lb: -8.0 for lb in BODY_BASE_LABELS} | {"I-<title>": 0.5},
    sticky=0.0,
)

# ---------------------------------------------------------------------------
# lexical-entry model (third cascade level; per-token within one <entry>)
# the reference stubs this level as EntryItem (EntryItem.java:20-31)
# ---------------------------------------------------------------------------

LEXICAL_LABELS = ("<num>", "<category>", "<desc>", "<count>", "<material>", "<other>")

LEXICAL_TEMPLATES = (
    ("Ulow", ((0, "lowercase"),)),
    ("Udig", ((0, "digit"),)),
    ("Ucap", ((0, "capitalisation"),)),
    ("Upunc", ((0, "punct_type"),)),
    ("Uprev", ((0, "prev_punct"),)),
    ("Unext", ((0, "next_lower"),)),
    ("Upos", ((0, "entry_position"),)),
    ("Udigpos", ((0, "digit"), (0, "entry_position"))),
    ("Udignext", ((0, "digit"), (0, "next_lower"))),
    ("Ucol", ((0, "seen_colon"),)),
    ("Ucolcap", ((0, "seen_colon"), (0, "capitalisation"))),
)

_MATERIAL_CODES = ("ar", "av", "br", "el", "pb")  # fixture materials


def _lexical_weights() -> dict[str, dict[str, float]]:
    w: dict[str, dict[str, float]] = {}
    # leading lot number: digits at entry position 0
    w["Udigpos:ALLDIGIT|0"] = {"<num>": 4.0}
    # category: capitalized words early in the entry
    w["Ucap:INITCAP"] = {"<category>": 1.6}
    w["Upos:0"] = {"<category>": 0.5}
    w["Upos:1"] = {"<category>": 0.5}
    # the colon splits category (before) from description (after)
    w["Ucol:0"] = {"<category>": 1.0, "<desc>": -1.5}
    w["Ucol:1"] = {"<desc>": 1.0, "<category>": -2.0}
    w["Ucolcap:1|NOCAPS"] = {"<desc>": 0.8}
    # count: digits followed by the count noun
    w["Udignext:ALLDIGIT|pièces"] = {"<count>": 5.0, "<desc>": -2.0}
    w["Udignext:ALLDIGIT|pièce"] = {"<count>": 5.0, "<desc>": -2.0}
    w["Ulow:pièces"] = {"<count>": 3.0}
    w["Ulow:pièce"] = {"<count>": 3.0}
    # material code: known codes, late in the entry
    for c in _MATERIAL_CODES:
        w[f"Ulow:{c}"] = {"<material>": 3.5}
    # punctuation is structural
    w["Upunc:DOT"] = {"<other>": 2.5, "<category>": -1.0, "<desc>": -1.0}
    w["Upunc:COMMA"] = {"<other>": 1.5}
    w["Upunc:PUNCT"] = {"<other>": 2.0, "<category>": -1.0, "<desc>": -0.5}
    w["Upunc:HYPHEN"] = {"<other>": 1.0}
    w["Upunc:OPENBRACKET"] = {"<other>": 1.0}
    w["Upunc:ENDBRACKET"] = {"<other>": 1.0}
    w["Upunc:QUOTE"] = {"<other>": 1.0}
    return w


def _lexical_transitions() -> dict[tuple[str, str], float]:
    order = ["<num>", "<category>", "<desc>", "<count>", "<material>"]
    t: dict[tuple[str, str], float] = {}
    for lb in LEXICAL_LABELS:
        t[(lb, lb)] = 1.2  # sticky runs
    # forward progression prior (num → category → desc → count → material)
    for i, a in enumerate(order):
        for j, b in enumerate(order):
            if j < i:
                t[(a, b)] = t.get((a, b), 0.0) - 3.0  # discourage regress
    # structural <other> freely interleaves
    for lb in order:
        t[("<other>", lb)] = 0.2
        t[(lb, "<other>")] = 0.2
    # forward progression bonus along the canonical entry grammar
    for a, b in zip(order, order[1:]):
        t[(a, b)] = t.get((a, b), 0.0) + 0.5
    return t


LEXICAL_MODEL = CRFModel(
    labels=LEXICAL_LABELS,
    templates=LEXICAL_TEMPLATES,
    weights=_lexical_weights(),
    transitions=_lexical_transitions(),
    init={"<num>": 1.0, "<desc>": -1.0, "<count>": -1.0, "<material>": -1.0},
    sticky=0.0,
)
