"""Paragraph-level (segment) dedup: first corpus-wide occurrence wins,
later occurrences are cut from their documents (Dolma-style span removal
re-expressed over the newline-free fixture corpus; dedup_ops.paragraph_dedup)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datacat_ray.pipelines.dedup_ops import (
    PARA_W,
    _doc_segments,
    paragraph_dedup,
)


def _words(n, start=0):
    return " ".join(f"w{i}" for i in range(start, start + n))


def _write_docs(tmp_path, texts):
    t = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["src0"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_doc_segments_roundtrip():
    text = _words(2 * PARA_W + 3)  # last segment short
    segs = _doc_segments(text)
    assert len(segs) == 3
    assert " ".join(segs) == text


def test_paragraph_dedup(ray_session, tmp_path):
    base = _words(2 * PARA_W)  # segs A B
    texts = [
        base,                                   # doc0: keeps both
        _doc_segments(base)[0] + " " + _words(PARA_W, 100),  # doc1: A dup
        base,                                   # doc2: fully duplicate
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r for r in paragraph_dedup(sf).take_all()}
    assert rows[0]["dedup_text"] == base and rows[0]["n_dropped"] == 0
    # doc1 loses its first segment (dup of doc0's A), keeps its unique tail
    assert rows[1]["dedup_text"] == _words(PARA_W, 100)
    assert rows[1]["n_dropped"] == 1 and rows[1]["n_segs"] == 2
    # doc2 is entirely duplicate → null text, all segments dropped
    assert rows[2]["dedup_text"] is None
    assert rows[2]["n_dropped"] == rows[2]["n_segs"] == 2


def test_paragraph_dedup_unique_corpus_identity(ray_session, tmp_path):
    texts = [_words(PARA_W * 2, 1000 * i) for i in range(4)]
    sf = _write_docs(tmp_path, texts)
    rows = {r["doc_id"]: r for r in paragraph_dedup(sf).take_all()}
    for i, text in enumerate(texts):
        assert rows[i]["dedup_text"] == text
        assert rows[i]["n_dropped"] == 0


def test_prefilter_mode_equals_join(ray_session, tmp_path):
    base = _words(2 * PARA_W)
    texts = [
        base,
        _doc_segments(base)[0] + " " + _words(PARA_W, 100),
        base,
        _words(PARA_W * 3, 500),
    ]
    sf = _write_docs(tmp_path, texts)
    drop_dir = str(tmp_path / "drops")
    join_rows = {r["doc_id"]: r for r in paragraph_dedup(sf).take_all()}
    pre_rows = {
        r["doc_id"]: r
        for r in paragraph_dedup(
            sf, mode="prefilter", drop_dir=drop_dir
        ).take_all()
    }
    assert pre_rows == join_rows
    import os

    assert any(f.startswith("bucket-") for f in os.listdir(drop_dir))
