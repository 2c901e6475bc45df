"""The flagship extraction pipeline (SURVEY.md §3.3 Ray shape).

    read_parquet(pages)                                 # url warc_ts html text lang
      → dedup_latest (groupby url, keep max warc_ts)    # D1 — the one shuffle
      → map_batches(extract_blocks)                     # S2' DOM + boilerplate strip
      → map_batches(tokenize_stage)                     # M1+M2+M3/M4 guards
      → map_batches(SegmenterStage, actor pool)         # M5+M6+M8 featurize → ST1 CRF → M13 zones
      → map_batches(BodyStage, actor pool)              # M14+M7 featurize → ST2 CRF → M15/M16 TEI + S9 text
      → write_parquet / Dataset

Featurization is FUSED into its consuming CRF actor (the feature structs are
5-10× the token payload; producing them in a separate stage would ship them
through the object store just to be read once — at 100 TB that is the
dominant traffic). The standalone ``featurize_stage`` remains available for
the features-debug sink (S10) and golden tests.

Output schema (one row per url):
    url, warc_ts, lang, extracted_text, tei, tei_body,
    zones:   list<struct<label,start,end>>   (token offsets, M13)
    entries: list<struct<label,start,end>>   (token offsets, body cascade)
    n_lines, n_tokens, error
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from datacat_ray.config import PipelineConfig
from datacat_ray.stages.crf import CRFDecoder, with_begin_prefix
from datacat_ray.stages.dedup import dedup_latest
from datacat_ray.stages.dom import (
    blocks_from_plain_text,
    extract_blocks,
    parse_main_blocks,
)
from datacat_ray.stages.line_features import (
    _FIELD_NAMES as _LINE_FIELD_NAMES,
    featurize_lines,
)
from datacat_ray.stages.lexical_features import featurize_entry_tokens
from datacat_ray.stages.models import BODY_MODEL, LEXICAL_MODEL, SEGMENTER_MODEL
from datacat_ray.stages.tei import (
    assemble_body_tei,
    assemble_segmenter_tei,
    token_char_offsets,
    body_label_runs,
    extracted_text,
)


from datacat_ray.stages.token_features import (
    _TOKEN_FIELD_NAMES as _BODY_FIELD_NAMES,
    featurize_body_tokens,
)
from datacat_ray.stages.tokenizer import tokenize_document, tokenize_stage
from datacat_ray.stages.zones import ZONE_STRUCT, decode_zones, zone_token_indices


def unwrapped_text(lines: list[dict]) -> str:
    """Reconstruct the pre-wrap block text: lines of one block joined by the
    space the wrap consumed (``wrap_text`` semantics), blocks joined by
    newline. For HTML whose block texts contain no hard breaks this is the
    exact inverse of the tokenizer's pseudo-line wrapping — the clean
    "main content" string a downstream consumer wants."""
    parts: list[str] = []
    cur_block = None
    for ln in lines:
        if ln["block_id"] != cur_block:
            parts.append(ln["text"])
            cur_block = ln["block_id"]
        else:
            parts[-1] = parts[-1] + " " + ln["text"]
    return "\n".join(parts)

SEGMENTED_SCHEMA_EXTRA = [
    pa.field("line_labels", pa.list_(pa.string())),
    pa.field("zones", pa.list_(ZONE_STRUCT)),
]

RESULT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("extracted_text", pa.string()),
        ("main_text", pa.string()),
        ("tei", pa.string()),
        ("tei_body", pa.string()),
        ("zones", pa.list_(ZONE_STRUCT)),
        ("entries", pa.list_(ZONE_STRUCT)),
        ("lexical", pa.list_(ZONE_STRUCT)),
        ("n_lines", pa.int32()),
        ("n_tokens", pa.int32()),
        ("error", pa.string()),
    ]
)


def _to_raw_fields(feats: list[dict], order: list[str]) -> list[dict]:
    """Named feature dicts → raw-column field space (``f0..fN`` keyed,
    stringified in serialization order) — the space trained model
    artifacts' templates reference (their corpora are raw feature
    files)."""
    return [
        {f"f{i}": str(d[name]) for i, name in enumerate(order)}
        for d in feats
    ]


class FusedExtractStage:
    """The whole per-document cascade in ONE actor ``__call__``: DOM parse +
    boilerplate strip (S2'), tokenize (M1/M2), line featurize + segmenter
    CRF + zone decode (M5/M6/ST1/M13), body featurize + entry CRF
    (M14/M7/ST2), TEI + text assembly (M15/M16/S9).

    Fused deliberately: every operator is document-local (SURVEY.md §4), so
    splitting them into separate map_batches stages ships the fat
    intermediate nested columns (lines/tokens/features, 5-10× the html
    payload) through the object store and pays Arrow⇄Python conversion at
    each boundary — measured ~8× the actual kernel cost. One stage = one
    conversion in (html bytes), one out (result strings). Both CRF decoders
    compile once per actor in ``__init__`` (the Ray analogue of the
    reference's parser singletons holding loaded Wapiti models,
    ``DatacatSegmenterParser.java:83-85``,
    ``DatacatBodySegmentationParser.java:63-67``)."""

    def __init__(
        self,
        max_tokens: int = 30_000,
        max_blocks: int = 3_000,
        start_page: int = -1,
        end_page: int = -1,
        tei_coordinates: bool = False,
        model_paths: dict | None = None,
        segment_sentences: bool = False,
    ) -> None:
        # ``model_paths`` swaps frozen models for trained artifacts (the
        # "deploy" leg of the model-improvement loop): keys "segmenter" /
        # "body" → JSON artifacts from `cli train` (pipelines/trainer.py).
        # Artifact templates reference the RAW feature columns (f0..fN in
        # serialization order), so decode inputs are converted per model.
        mp = model_paths or {}
        if "segmenter" in mp:
            from datacat_ray.pipelines.trainer import load_model_json

            self.seg = load_model_json(mp["segmenter"])
            self.seg_raw_fields = True
        else:
            self.seg = CRFDecoder(SEGMENTER_MODEL)
            self.seg_raw_fields = False
        if "body" in mp:
            from datacat_ray.pipelines.trainer import load_model_json

            self.body = load_model_json(mp["body"])
            self.body_raw_fields = True
        else:
            self.body = CRFDecoder(BODY_MODEL)
            self.body_raw_fields = False
        self.lexical = CRFDecoder(LEXICAL_MODEL)
        self.max_tokens = max_tokens
        self.max_blocks = max_blocks
        self.start_page = start_page
        self.end_page = end_page
        # -teiCoordinates analogue (GrobidDatacatMainArgs.java): zone/entry
        # elements carry char-span coords into the extracted text
        self.tei_coordinates = tei_coordinates
        # -segmentSentences analogue: <s> sentence level in body TEI
        self.segment_sentences = segment_sentences

    def _lexical_spans(self, tokens: list[str], entries: list[dict]) -> list[dict]:
        """Third cascade level: label the tokens of each ``<entry>`` run
        with lexical fields (num/category/desc/count/material)."""
        spans: list[dict] = []
        for run in entries:
            if run["label"] != "<entry>":
                continue
            feats, idx = featurize_entry_tokens(tokens, run["start"], run["end"])
            if not feats:
                continue
            labels = self.lexical.decode(feats)
            spans.extend(body_label_runs(labels, idx))
        return spans

    def _one(self, url, lang, html, text):
        """(extracted_text, main_text, tei, tei_body, zones, entries,
        n_lines, n_tokens, error) for one document."""
        if html is not None:
            blocks = parse_main_blocks(html.decode("utf-8", errors="replace"))
        elif text is not None:
            blocks = blocks_from_plain_text(text)
        else:
            blocks = []
        if self.start_page >= 0 or self.end_page >= 0:
            # O4 page-range limit (row-local slice on the pseudo-page ids;
            # reference start/end-page semantics, fromPdf args)
            lo = self.start_page if self.start_page >= 0 else 0
            hi = self.end_page if self.end_page >= 0 else float("inf")
            blocks = [b for b in blocks if lo <= b["page"] <= hi]
        if len(blocks) > self.max_blocks:
            return "", "", "", "", [], [], [], 0, 0, f"TOO_MANY_BLOCKS: {len(blocks)}"
        lines, tokens, token_line = tokenize_document(blocks)
        if len(tokens) > self.max_tokens:
            return "", "", "", "", [], [], [], 0, 0, f"TOO_MANY_TOKENS: {len(tokens)}"
        feats = featurize_lines(lines)
        if self.seg_raw_fields:
            feats = _to_raw_fields(feats, _LINE_FIELD_NAMES)
        line_labels = with_begin_prefix(self.seg.decode(feats))
        zones = decode_zones(line_labels, token_line, len(tokens))
        body_ranges = zone_token_indices(zones, "<body>")
        bfeats, idx = featurize_body_tokens(tokens, token_line, lines, body_ranges)
        if self.body_raw_fields:
            bfeats = _to_raw_fields(bfeats, _BODY_FIELD_NAMES)
        entries = body_label_runs(self.body.decode(bfeats), idx)
        lexical = self._lexical_spans(tokens, entries)
        if self.tei_coordinates:
            offs = token_char_offsets(tokens)
            seg_coords = [(offs[z["start"]], offs[z["end"]]) for z in zones]
            body_coords = [(offs[r["start"]], offs[r["end"]]) for r in entries]
        else:
            seg_coords = body_coords = None
        return (
            extracted_text(tokens),
            unwrapped_text(lines),
            assemble_segmenter_tei(url, lang, lines, line_labels, seg_coords),
            assemble_body_tei(url, lang, tokens, entries, body_coords,
                              self.segment_sentences),
            zones,
            entries,
            lexical,
            len(lines),
            len(tokens),
            None,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        res = {k: [] for k in RESULT_SCHEMA.names}
        for url, ts, lang, html, text in zip(
            batch["url"].to_pylist(),
            batch["warc_ts"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["html"].to_pylist(),
            batch["text"].to_pylist(),
        ):
            try:
                (text_out, main, tei, tei_body, zones, entries, lexical,
                 n_lines, n_tokens, err) = self._one(url, lang, html, text)
            except Exception as exc:  # noqa: BLE001 — poison-row side output
                text_out = main = tei = tei_body = ""
                zones, entries, lexical, n_lines, n_tokens = [], [], [], 0, 0
                err = f"{type(exc).__name__}: {exc}"
            res["url"].append(url)
            res["warc_ts"].append(ts)
            res["lang"].append(lang)
            res["extracted_text"].append(text_out)
            res["main_text"].append(main)
            res["tei"].append(tei)
            res["tei_body"].append(tei_body)
            res["zones"].append(zones)
            res["entries"].append(entries)
            res["lexical"].append(lexical)
            res["n_lines"].append(n_lines)
            res["n_tokens"].append(n_tokens)
            res["error"].append(err)
        return pa.Table.from_pydict(res, schema=RESULT_SCHEMA)


class SegmenterStage:
    """ST1 actor: line featurization + segmenter CRF + zone decode.

    The decoder (template table + weight vectors) is compiled ONCE per actor
    in ``__init__`` — the Ray analogue of the reference's parser singleton
    holding the loaded Wapiti model (``DatacatSegmenterParser.java:83-85``).
    """

    def __init__(self) -> None:
        self.decoder = CRFDecoder(SEGMENTER_MODEL)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines_col = batch["lines"].to_pylist()
        token_line_col = batch["token_line"].to_pylist()
        n_tokens = [len(t) for t in batch["tokens"].to_pylist()]
        labels_col: list[list[str]] = []
        zones_col: list[list[dict]] = []
        for lines, token_line, ntok in zip(lines_col, token_line_col, n_tokens):
            feats = featurize_lines(lines)
            labels = with_begin_prefix(self.decoder.decode(feats))
            labels_col.append(labels)
            zones_col.append(decode_zones(labels, token_line, ntok))
        out = batch.append_column(
            "line_labels", pa.array(labels_col, type=pa.list_(pa.string()))
        )
        return out.append_column("zones", pa.array(zones_col, type=pa.list_(ZONE_STRUCT)))


class BodyStage:
    """ST2 actor: body token featurization + entry CRF + TEI/flat-text
    assembly. Emits the final result rows."""

    def __init__(self, segment_sentences: bool = False) -> None:
        self.decoder = CRFDecoder(BODY_MODEL)
        self._lex = FusedExtractStage()  # reuse the lexical-level decode
        self.segment_sentences = segment_sentences

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        tss = batch["warc_ts"].to_pylist()
        langs = batch["lang"].to_pylist()
        errors = batch["error"].to_pylist()
        lines_col = batch["lines"].to_pylist()
        tokens_col = batch["tokens"].to_pylist()
        token_line_col = batch["token_line"].to_pylist()
        labels_col = batch["line_labels"].to_pylist()
        zones_col = batch["zones"].to_pylist()

        res = {k: [] for k in RESULT_SCHEMA.names}
        for url, ts, lang, err, lines, tokens, token_line, line_labels, zones in zip(
            urls, tss, langs, errors, lines_col, tokens_col, token_line_col,
            labels_col, zones_col,
        ):
            try:
                body_ranges = zone_token_indices(zones, "<body>")
                feats, idx = featurize_body_tokens(
                    tokens, token_line, lines, body_ranges
                )
                body_labels = self.decoder.decode(feats)
                entries = body_label_runs(body_labels, idx)
                lexical = self._lex._lexical_spans(tokens, entries)
                text = extracted_text(tokens)
                main = unwrapped_text(lines)
                tei = assemble_segmenter_tei(url, lang, lines, line_labels)
                tei_body = assemble_body_tei(
                    url, lang, tokens, entries, None, self.segment_sentences
                )
            except Exception as exc:  # noqa: BLE001 — poison-row side output
                entries, lexical, text, main, tei, tei_body = [], [], "", "", "", ""
                err = err or f"{type(exc).__name__}: {exc}"
            res["url"].append(url)
            res["warc_ts"].append(ts)
            res["lang"].append(lang)
            res["extracted_text"].append(text)
            res["main_text"].append(main)
            res["tei"].append(tei)
            res["tei_body"].append(tei_body)
            res["zones"].append(zones)
            res["entries"].append(entries)
            res["lexical"].append(lexical)
            res["n_lines"].append(len(lines))
            res["n_tokens"].append(len(tokens))
            res["error"].append(err)
        return pa.Table.from_pydict(res, schema=RESULT_SCHEMA)


_TASK_STAGE_CACHE: dict[tuple, "FusedExtractStage"] = {}


def _fused_task(
    batch: pa.Table,
    max_tokens: int,
    max_blocks: int,
    start_page: int = -1,
    end_page: int = -1,
    tei_coordinates: bool = False,
    model_paths: tuple = (),
    segment_sentences: bool = False,
) -> pa.Table:
    """Task-mode wrapper around ``FusedExtractStage`` with a per-WORKER-
    PROCESS stage cache: the decoders compile once per worker (Ray reuses
    worker processes across tasks), after which every task runs warm.

    Tasks-with-process-cache vs an actor pool is a measured trade: these
    decoders compile in milliseconds, and plain tasks schedule onto every
    free core instantly while an autoscaling actor pool ramps from 1 actor
    (measured 2-6s of pool creation + ramp on a 10s job). An actor pool
    (``execution="actors"``) is the right choice only when per-actor state
    is expensive — multi-GB model weights, a remote connection — which is
    exactly what ``FusedExtractStage.__init__`` models."""
    key = (max_tokens, max_blocks, start_page, end_page, tei_coordinates,
           model_paths, segment_sentences)
    st = _TASK_STAGE_CACHE.get(key)
    if st is None:
        _TASK_STAGE_CACHE.clear()
        st = _TASK_STAGE_CACHE[key] = FusedExtractStage(
            max_tokens, max_blocks, start_page, end_page, tei_coordinates,
            dict(model_paths), segment_sentences,
        )
    return st(batch)


def build_extract_pipeline(
    ds: "ray.data.Dataset",
    cfg: PipelineConfig | None = None,
    dedup: bool = True,
) -> "ray.data.Dataset":
    """Compose the cascade over a pages Dataset (lazy; caller consumes):
    one fused stage (see ``FusedExtractStage`` for why fusing beats a stage
    chain here — every operator is document-local, so stage boundaries only
    add object-store traffic).

    ``dedup=True`` uses the exact groupby dedup (one wide shuffle). Prefer
    ``extract_pages`` for parquet inputs — its winner-prefilter dedup keeps
    the wide html column out of any shuffle entirely."""
    cfg = cfg or PipelineConfig()
    if dedup:
        ds = dedup_latest(ds, key="url", ts="warc_ts")
    if cfg.execution == "actors":
        return ds.map_batches(
            FusedExtractStage,
            fn_constructor_kwargs={
                "max_tokens": cfg.max_tokens, "max_blocks": cfg.max_blocks,
                "start_page": cfg.start_page, "end_page": cfg.end_page,
                "tei_coordinates": cfg.tei_coordinates,
                "model_paths": cfg.model_paths,
                "segment_sentences": cfg.segment_sentences,
            },
            batch_format="pyarrow",
            batch_size=cfg.segmenter.batch_size,
            concurrency=cfg.segmenter.concurrency,
            num_cpus=cfg.segmenter.num_cpus,
        )
    import functools

    return ds.map_batches(
        functools.partial(
            _fused_task, max_tokens=cfg.max_tokens, max_blocks=cfg.max_blocks,
            start_page=cfg.start_page, end_page=cfg.end_page,
            tei_coordinates=cfg.tei_coordinates,
            model_paths=tuple(sorted((cfg.model_paths or {}).items())),
            segment_sentences=cfg.segment_sentences,
        ),
        batch_format="pyarrow",
        batch_size=cfg.segmenter.batch_size,
        num_cpus=cfg.segmenter.num_cpus,
    )


def build_staged_pipeline(
    ds: "ray.data.Dataset", cfg: PipelineConfig | None = None
) -> "ray.data.Dataset":
    """The un-fused stage chain (DOM → tokenize → segmenter pool → body
    pool). Kept for per-stage debugging/inspection — the fused pipeline is
    the production path."""
    cfg = cfg or PipelineConfig()
    ds = ds.map_batches(
        extract_blocks, batch_format="pyarrow", batch_size=cfg.dom.batch_size
    )
    ds = ds.map_batches(
        lambda b: tokenize_stage(b, cfg.max_tokens, cfg.max_blocks),
        batch_format="pyarrow",
        batch_size=cfg.tokenize.batch_size,
    )
    ds = ds.map_batches(
        SegmenterStage,
        batch_format="pyarrow",
        batch_size=cfg.segmenter.batch_size,
        concurrency=cfg.segmenter.concurrency,
        num_cpus=cfg.segmenter.num_cpus,
    )
    return ds.map_batches(
        BodyStage,
        fn_constructor_kwargs={"segment_sentences": cfg.segment_sentences},
        batch_format="pyarrow",
        batch_size=cfg.body.batch_size,
        concurrency=cfg.body.concurrency,
        num_cpus=cfg.body.num_cpus,
    )


def extract_pages(
    pages_path, cfg: PipelineConfig | None = None, dedup: str = "prefilter"
) -> "ray.data.Dataset":
    """read_parquet → cascade. Column pruning happens at the read: only the
    five input-hint columns leave storage.

    ``dedup``:
    - ``"prefilter"`` (default): narrow (url, warc_ts) winner pass +
      broadcast filter — stale captures die at the read, the wide html
      column never crosses a shuffle (the 10^12-row design; see
      ``dedup_latest_prefilter`` for the tie caveat + bucketed scale path).
    - ``"exact"``: groupby-based exact dedup (one wide hash shuffle).
    - ``"none"``: input already unique per url.
    """
    from datacat_ray.stages.dedup import dedup_latest_prefilter

    cols = ["url", "warc_ts", "html", "text", "lang"]
    if dedup == "prefilter":
        ds = dedup_latest_prefilter(pages_path, columns=cols)
        return build_extract_pipeline(ds, cfg, dedup=False)
    ds = ray.data.read_parquet(pages_path, columns=cols)
    return build_extract_pipeline(ds, cfg, dedup=(dedup == "exact"))
