"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on the sf0.001-scale synthetic
pages corpus; ``queries()``/``oracle_sql()`` expose the operator suite
(see ``kgraft/queries.py``). Ray is initialised by the driver before
this module is imported — nothing here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os

from collections.abc import Callable
from typing import Any

# numpy hugepage madvise stalls on this host's THP compaction (see
# bench.py); best-effort here — helps any process that imports this
# module before numpy
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")


def entry() -> Any:
    """Flagship KG pipeline at sf0.001 scale: returns the triples Dataset."""
    from kgraft.queries import kg_triples

    return kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from kgraft.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kgraft.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
