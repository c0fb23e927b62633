"""Central registry: collects every operator module's QUERIES/ORACLE
into the driver contract consumed by __spark_entry__.py."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flinkproj_spark.operators import clean, report

_MODULES = [clean, report]


def _modules():
    # Imported lazily/defensively so one broken extension module doesn't
    # take down the whole contract.
    mods = list(_MODULES)
    for name in ("relational", "tpch", "tpch2", "analytic", "dedup", "similarity", "text", "retrieval", "multimodal", "sampling", "e2e"):
        try:
            mod = __import__(f"flinkproj_spark.operators.{name}", fromlist=[name])
            mods.append(mod)
        except Exception:
            pass
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for key, fn in getattr(mod, "QUERIES", {}).items():
            if key in out:
                raise ValueError(f"duplicate query key {key!r}")
            out[key] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        for key, sql in getattr(mod, "ORACLE", {}).items():
            out[key] = sql
    return out
