"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship contribution pipeline; ``queries``/``oracle_sql``
surface every implemented operator from SURVEY.md §2 (plus the
training-data-pipeline operators) with DuckDB oracles. Implementations live
in ``ohsome_planet_spark.plans.queries``.
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
