"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in airbyte_ray) calls ``ray.init()`` / ``ray.shutdown()``.

* ``entry()`` — flagship pipeline at sf0.001: full CDC replay of the
  events stream through the exactly-once lake (hash-partitioned LWW merge,
  manifest commit), returning the final upserted table.
* ``queries()`` — one entry per operator family from SURVEY.md §2 plus the
  training-data ops (dedup/ANN/text); each takes sf_dir.
* ``oracle_sql()`` — DuckDB equivalents for EVERY query: heuristic /
  approximate ops (lang-id, minhash/simhash dedup, LSH/IVF ANN, rolling
  fingerprint, embedding near-dup) use planted deterministic fixtures that
  make the expected output SQL-expressible — see the q_* docstrings in
  ``airbyte_ray/driver_queries.py`` for each soundness argument.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airbyte_ray.driver_queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry() -> Any:
    from airbyte_ray.driver_queries import q_cdc_replay_upsert

    return q_cdc_replay_upsert("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
