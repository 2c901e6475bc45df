"""JSONL source/sink for the documents schema — the LLM-data interchange
staple (one JSON object per line: doc_id, text, lang, ...).

Reading uses Ray's native ``read_json`` (streaming, one task per file);
writing shards via ``write_json``. A converter round-trips the driver's
parquet documents table so every text-analysis operator can run over JSONL
corpora unchanged (they take a Dataset-producing source; the sf_dir
convenience wrappers stay parquet)."""

from __future__ import annotations

import pyarrow as pa

DOCUMENT_COLUMNS = ["doc_id", "text", "lang", "n_chars"]


def read_documents_jsonl(paths) -> "ray.data.Dataset":
    """JSONL file(s)/dir → Dataset with the documents schema (missing
    optional fields null-filled; extra fields dropped)."""
    import ray.data

    ds = ray.data.read_json(paths)

    def _norm(t: pa.Table) -> pa.Table:
        cols = {}
        names = set(t.column_names)
        n = t.num_rows
        cols["doc_id"] = (
            t["doc_id"].cast(pa.int64()) if "doc_id" in names
            else pa.nulls(n, pa.int64())
        )
        cols["text"] = (
            t["text"].cast(pa.string()) if "text" in names
            else pa.nulls(n, pa.string())
        )
        cols["lang"] = (
            t["lang"].cast(pa.string()) if "lang" in names
            else pa.nulls(n, pa.string())
        )
        if "n_chars" in names:
            cols["n_chars"] = t["n_chars"].cast(pa.int64())
        else:
            import pyarrow.compute as pc

            cols["n_chars"] = pc.utf8_length(cols["text"]).cast(pa.int64())
        return pa.Table.from_pydict(cols)

    return ds.map_batches(_norm, batch_format="pyarrow")


def write_documents_jsonl(ds, out_dir: str) -> str:
    """Dataset → JSONL shards (Ray-native, one file per block)."""
    ds.write_json(out_dir)
    return out_dir


def documents_parquet_to_jsonl(sf_dir: str, out_dir: str) -> str:
    """Convert the driver's documents.parquet to JSONL shards."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=DOCUMENT_COLUMNS
    )
    return write_documents_jsonl(ds, out_dir)
