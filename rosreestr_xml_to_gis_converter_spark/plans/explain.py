"""Plan inspection helpers — the engine's "is Catalyst doing what we
think" toolkit.

The optimizer section of SURVEY.md §4 commits to stock Catalyst + AQE +
deliberate layout; these helpers make that checkable in tests and at the
REPL instead of eyeballing `.explain()` output.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, execute: bool = False) -> str:
    """Physical plan string; with ``execute=True`` runs the query first so
    AQE finalizes (codegen spans appear as ``*(n)`` markers)."""
    if execute:
        df.count()
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanChecks:
    plan: str

    @property
    def final(self) -> str:
        return self.plan.split("== Initial Plan ==")[0]

    def has_broadcast_join(self) -> bool:
        return "BroadcastHashJoin" in self.final

    def has_codegen(self) -> bool:
        return "*(1)" in self.final or "WholeStageCodegen" in self.final

    def python_stages(self) -> int:
        return self.final.count("MapInArrow") + self.final.count("MapInPandas")

    def scan_columns(self) -> list[str]:
        """Columns the parquet scan actually reads (pruning check)."""
        for line in self.final.splitlines():
            if "FileScan parquet" in line and "ReadSchema:" in line:
                schema = line.split("ReadSchema:")[1].strip()
                inner = schema.split("struct<", 1)[1].rsplit(">", 1)[0]
                return [p.split(":")[0] for p in inner.split(",") if p]
        return []

    def has_shuffle(self) -> bool:
        return "Exchange" in self.final.replace("BroadcastExchange", "")


def plan_checks(df: DataFrame, execute: bool = False) -> PlanChecks:
    return PlanChecks(executed_plan(df, execute))
