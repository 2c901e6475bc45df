"""D1 dedup: keep latest warc_ts per url (the pipeline's one shuffle)."""

import pyarrow as pa

from datacat_ray.stages.dedup import _dedup_batch, dedup_latest


def _table():
    return pa.Table.from_pydict(
        {
            "url": ["a", "b", "a", "a", "b", "c"],
            "warc_ts": [3, 10, 1, 7, 20, 5],
            "payload": ["a3", "b10", "a1", "a7", "b20", "c5"],
        }
    )


def test_dedup_batch_vectorized():
    out = _dedup_batch(_table(), "url", "warc_ts")
    got = dict(zip(out["url"].to_pylist(), out["payload"].to_pylist()))
    assert got == {"a": "a7", "b": "b20", "c": "c5"}


def test_dedup_latest_global(ray_session):
    import ray.data

    # duplicates split ACROSS blocks → within-batch pre-dedup alone can't win
    ds = ray.data.from_arrow(_table()).repartition(3)
    out = dedup_latest(ds, key="url", ts="warc_ts").take_all()
    got = {r["url"]: r["payload"] for r in out}
    assert got == {"a": "a7", "b": "b20", "c": "c5"}
    assert len(out) == 3
