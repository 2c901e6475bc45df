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
from datacat_ray.stages.dom import extract_blocks
from datacat_ray.stages.line_features import featurize_lines
from datacat_ray.stages.models import BODY_MODEL, SEGMENTER_MODEL
from datacat_ray.stages.tei import (
    assemble_body_tei,
    assemble_segmenter_tei,
    body_label_runs,
    extracted_text,
)


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
from datacat_ray.stages.token_features import featurize_body_tokens
from datacat_ray.stages.tokenizer import tokenize_stage
from datacat_ray.stages.zones import ZONE_STRUCT, decode_zones, zone_token_indices

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
        ("n_lines", pa.int32()),
        ("n_tokens", pa.int32()),
        ("error", pa.string()),
    ]
)


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

    def __init__(self) -> None:
        self.decoder = CRFDecoder(BODY_MODEL)

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
                text = extracted_text(tokens)
                main = unwrapped_text(lines)
                tei = assemble_segmenter_tei(url, lang, lines, line_labels)
                tei_body = assemble_body_tei(url, lang, tokens, entries)
            except Exception as exc:  # noqa: BLE001 — poison-row side output
                entries, text, main, tei, tei_body = [], "", "", "", ""
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
            res["n_lines"].append(len(lines))
            res["n_tokens"].append(len(tokens))
            res["error"].append(err)
        return pa.Table.from_pydict(res, schema=RESULT_SCHEMA)


def build_extract_pipeline(
    ds: "ray.data.Dataset", cfg: PipelineConfig | None = None
) -> "ray.data.Dataset":
    """Compose the full cascade over a pages Dataset (lazy; caller consumes)."""
    cfg = cfg or PipelineConfig()
    ds = dedup_latest(ds, key="url", ts="warc_ts")
    ds = ds.map_batches(
        extract_blocks,
        batch_format="pyarrow",
        batch_size=cfg.dom.batch_size,
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
    ds = ds.map_batches(
        BodyStage,
        batch_format="pyarrow",
        batch_size=cfg.body.batch_size,
        concurrency=cfg.body.concurrency,
        num_cpus=cfg.body.num_cpus,
    )
    return ds


def extract_pages(
    pages_path: str, cfg: PipelineConfig | None = None
) -> "ray.data.Dataset":
    """read_parquet → cascade. Column pruning happens at the read: only the
    five input-hint columns leave storage."""
    ds = ray.data.read_parquet(
        pages_path, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    return build_extract_pipeline(ds, cfg)
