"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in zhtml_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthetic
    Common-Crawl-style pages → HTML5 parse → main-content extraction."""
    from zhtml_ray.pipelines.extract import run_extract
    return run_extract("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from zhtml_ray.pipelines.queries import queries as _q
    return _q()


def oracle_sql() -> dict[str, str]:
    from zhtml_ray.pipelines.queries import oracle_sql as _o
    return _o()
