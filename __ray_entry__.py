"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself BEFORE importing this module:
nothing here (or in the library code) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship extraction cascade on ``/root/testdata/sf0.001``.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md §2); each takes an sf_dir and returns a Dataset / Table.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query
  (column names aliased identically on both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from datacat_ray.pipelines.queries import (
    build_oracle_sql,
    build_queries,
    extract_flagship,
)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return extract_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracle_sql()
