"""Generate and freeze the golden expectations for the e2e byte-identity test.

Run once (and only deliberately — goldens are the frozen conformance
surface, the analogue of the reference's committed corpus fixtures,
SURVEY.md §5):

    python scripts/make_goldens.py

Writes tests/golden/extract_smoke.parquet with per-url expected
extracted_text / tei / tei_body bytes and span counts for the seeded
fixture corpus (n_urls=60, seed=42).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden", "extract_smoke.parquet"
)
N_URLS = 60
SEED = 42


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=4, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from datacat_ray.fixtures import write_pages_parquet
    from datacat_ray.pipelines.extract import extract_pages

    write_pages_parquet("/tmp/golden_pages", n_urls=N_URLS, seed=SEED,
                        rows_per_file=17)
    rows = extract_pages("/tmp/golden_pages").take_all()
    rows.sort(key=lambda r: r["url"])
    table = pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "extracted_text": [r["extracted_text"] for r in rows],
            "tei": [r["tei"] for r in rows],
            "tei_body": [r["tei_body"] for r in rows],
            "n_zones": [len(r["zones"]) for r in rows],
            "n_entries": [len(r["entries"]) for r in rows],
            "error": [r["error"] for r in rows],
        }
    )
    pq.write_table(table, GOLDEN_PATH)
    print(f"wrote {table.num_rows} golden rows -> {GOLDEN_PATH}")
    ray.shutdown()


if __name__ == "__main__":
    main()
