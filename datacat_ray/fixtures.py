"""Deterministic synthetic page-table generator (FIXTURES.md §1).

Emits the Common-Crawl-style input table from BASELINE.json ``input_hint``:

    (url: string, warc_ts: timestamp[us], html: binary, text: string,
     lang: string)

with sale-catalogue-shaped HTML mirroring the reference conformance corpus
structure (front matter with sale dates / "CONDITIONS DE LA VENTE", a body of
numbered entries like ``12. Monnaies d'Italie: écu et divisions ; 39 pièces.
AR.`` — cf. ``resources/dataset/datacat-body-segmentation/corpus/tei/
12148-bpt6k97773331.training.bodySegmentation.datacat.text.tei.xml`` — back
matter, plus nav/footer/link-farm boilerplate the DOM stage must strip).

Everything is seeded and pure-functional: ``make_pages_table(n_urls, seed)``
always returns bit-identical Arrow tables. Skew/edge rows per FIXTURES.md:
~20% multi-capture urls, ~1% oversized pages, null-html / null-lang /
pure-boilerplate rows.
"""

from __future__ import annotations

import random

import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_CITIES = ["Paris", "Lyon", "Bruxelles", "London", "Genève", "Rouen"]
_EXPERTS = ["H. HOFFMANN", "ROLLIN & FEUARDENT", "E. BOURGEY", "J. DESVOUGES", "L. NAVILLE"]
_MONTHS = [
    "janvier", "février", "mars", "avril", "mai", "juin",
    "juillet", "août", "septembre", "octobre", "novembre", "décembre",
]
_CATEGORIES = [
    "Monnaies d'Italie", "Monnaies grecques", "Monnaies romaines",
    "Médailles françaises", "Jetons et méreaux", "Monnaies féodales",
    "Monnaies royales", "Antiquités égyptiennes", "Bronzes antiques",
    "Monnaies byzantines",
]
_MATERIALS = ["AR", "AV", "BR", "EL", "PB"]
_ADJ = ["écu et divisions", "deniers variés", "grand bronze", "tétradrachme",
        "statère d'or", "sesterces", "oboles", "pièces diverses"]
_NAV_WORDS = ["Accueil", "Catalogues", "Ventes", "Experts", "Contact", "Archives",
              "Recherche", "Connexion"]


def _entry_line(rng: random.Random, num: int) -> str:
    cat = rng.choice(_CATEGORIES)
    adj = rng.choice(_ADJ)
    n = rng.randint(1, 120)
    mat = rng.choice(_MATERIALS)
    return f"{num}. {cat}: {adj} ; {n} pièces. {mat}."


def _front_matter(rng: random.Random, title_city: str) -> list[str]:
    day = rng.randint(1, 28)
    month = rng.choice(_MONTHS)
    year = rng.randint(1860, 1920)
    expert = rng.choice(_EXPERTS)
    return [
        f"Vente du {day} {month} {year}",
        "COLLECTION",
        expert,
        "ANTIQUITÉS",
        f"Catalogue sommaire, {title_city}",
        "CONDITIONS DE LA VENTE",
        "La vente se fera au comptant.",
        f"Exposition publique le {day} {month} {year}.",
    ]


def _back_matter(rng: random.Random) -> list[str]:
    return [
        "TABLE DES MATIÈRES",
        "Monnaies ................ page 3",
        "Médailles ............... page 17",
        f"Imprimerie {rng.choice(_CITIES)}, {rng.randint(1860, 1920)}",
    ]


def _boilerplate_nav(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/{w.lower()}">{w}</a> | ' for w in rng.sample(_NAV_WORDS, 5)
    )
    return f'<nav class="menu">{links}</nav>'


def _boilerplate_footer(rng: random.Random) -> str:
    year = rng.randint(2015, 2024)
    farm = "".join(
        f'<a href="/tag/{i}">tag{i}</a> ' for i in rng.sample(range(100), 12)
    )
    return (
        f'<footer><div class="links">{farm}</div>'
        f"<p>Copyright {year} Example Archive. All rights reserved. "
        f'<a href="/tos">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
    )


def make_catalogue_html(
    rng: random.Random, *, n_entries: int = 12, pure_boilerplate: bool = False
) -> tuple[str, str]:
    """Return ``(html, main_text)``: the full page HTML and the
    boilerplate-free main-content text (front + entries + back, one line per
    content line) the extractor is expected to recover."""
    city = rng.choice(_CITIES)
    nav = _boilerplate_nav(rng)
    footer = _boilerplate_footer(rng)
    if pure_boilerplate:
        html = f"<html><body>{nav}{nav}{footer}</body></html>"
        return html, ""
    front = _front_matter(rng, city)
    entries = [_entry_line(rng, i + 1) for i in range(n_entries)]
    back = _back_matter(rng)
    front_html = "".join(
        f"<h1>{line}</h1>" if i == 0 else f"<p>{line}</p>"
        for i, line in enumerate(front)
    )
    body_html = "".join(f"<p>{line}</p>" for line in entries)
    back_html = "".join(f"<p>{line}</p>" for line in back)
    html = (
        "<html><head><title>catalogue</title></head><body>"
        f"{nav}"
        f'<div class="front">{front_html}</div>'
        f'<div class="body">{body_html}</div>'
        f'<div class="back">{back_html}</div>'
        f"{footer}"
        "</body></html>"
    )
    main_text = "\n".join(front + entries + back)
    return html, main_text


_BASE_TS_US = 1_600_000_000_000_000  # 2020-09-13T12:26:40Z, microseconds


def make_pages_table(n_urls: int = 500, seed: int = 42) -> pa.Table:
    """Deterministic pages table. Same (n_urls, seed) → identical bytes."""
    rng = random.Random(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_urls):
        url = f"https://catalogues.example.org/sale/{seed}/{i:06d}"
        r = rng.random()
        oversized = rng.random() < 0.01
        n_entries = rng.randint(200, 2000) if oversized else rng.randint(4, 24)
        pure_bp = rng.random() < 0.02
        html, main_text = make_catalogue_html(
            rng, n_entries=n_entries, pure_boilerplate=pure_bp
        )
        lang = rng.choice(["fr", "fr", "fr", "en", None])
        # ~3% null html → plain-text fallback path (S3)
        null_html = rng.random() < 0.03
        n_caps = 1
        if r < 0.20:
            n_caps = rng.randint(2, 3)
        base = _BASE_TS_US + i * 86_400_000_000
        for c in range(n_caps):
            urls.append(url)
            tss.append(base + c * 3_600_000_000 + rng.randint(0, 1000) * 1000)
            if null_html:
                htmls.append(None)
                texts.append(main_text)
            else:
                # stale captures carry a perturbed body so dedup visibly
                # matters: only the LATEST capture's content is golden
                if c < n_caps - 1:
                    stale_html, _ = make_catalogue_html(
                        rng, n_entries=max(1, n_entries - 1)
                    )
                    htmls.append(stale_html.encode("utf-8"))
                else:
                    htmls.append(html.encode("utf-8"))
                texts.append(None)
            langs.append(lang)
    return pa.Table.from_pydict(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs},
        schema=PAGES_SCHEMA,
    )


def write_pages_parquet(
    path: str, n_urls: int = 500, seed: int = 42, rows_per_file: int = 10_000
) -> str:
    """Write the synthetic pages table as a (possibly multi-file) parquet
    directory; returns ``path``. Files are sharded so Ray can plan parallel
    read fragments even at small scale."""
    import os

    import pyarrow.parquet as pq

    table = make_pages_table(n_urls, seed)
    os.makedirs(path, exist_ok=True)
    nrows = table.num_rows
    shard = 0
    for start in range(0, nrows, rows_per_file):
        pq.write_table(
            table.slice(start, rows_per_file),
            os.path.join(path, f"pages-{shard:05d}.parquet"),
        )
        shard += 1
    return path


def pages_from_documents(sf_dir: str) -> pa.Table:
    """Deterministically wrap the driver's ``documents`` table
    (``/root/testdata/sf*/documents.parquet``) into the pages schema so the
    flagship pipeline can run over driver testdata: one url per doc_id, html
    synthesized from the document text inside the catalogue template, seeded
    by doc_id (stable across calls)."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id, text, lang in zip(
        docs["doc_id"].to_pylist(),
        docs["text"].to_pylist(),
        docs["lang"].to_pylist(),
    ):
        rng = random.Random(doc_id)
        nav = _boilerplate_nav(rng)
        footer = _boilerplate_footer(rng)
        paras = "".join(
            f"<p>{line}</p>" for line in (text or "").split("\n") if line.strip()
        )
        # deterministic page assets (doc_id % 5 images): <img> emits no
        # text, so the byte-identity surface is untouched; the asset
        # extractor (S12/O2 web-text form) must recover exactly these
        imgs = "".join(
            f'<img src="https://img.example.org/{doc_id}/{i}.png" alt="">'
            for i in range(int(doc_id) % 5)
        )
        html = (
            f"<html><body>{nav}{imgs}"
            f"<div class=\"main\">{paras}</div>{footer}</body></html>"
        )
        urls.append(f"https://docs.example.org/{doc_id}")
        tss.append(_BASE_TS_US + int(doc_id) * 1_000_000)
        htmls.append(html.encode("utf-8"))
        texts.append(None)
        langs.append(lang)
    return pa.Table.from_pydict(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs},
        schema=PAGES_SCHEMA,
    )
