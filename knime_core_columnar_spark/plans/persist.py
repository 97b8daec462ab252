"""JSON persistence for transform plans — the mirror of the reference's
TableTransformNodeSettingsPersistor (SURVEY.md §2.1):

    persisted IR catalog: SOURCE, APPEND, SELECT, CONCATENATE, SLICE,
    IDENTITY, ROWINDEX, MAP, APPEND_MAP, APPEND_MISSING
    (TableTransformNodeSettingsPersistor.java:374-476); RowFilter and
    Observer are runtime-only there — we persist FILTER too since our
    predicates are plain SQL strings (no factory registry needed, which
    is what forced the reference's extension-point Persistor machinery).

A Plan is a linear pipeline of steps over one primary source plus named
side sources (for APPEND/CONCATENATE — ≅ the reference's UUID→table
ReferenceTables map, ReferenceTables.java:76-146). Expressions are stored
as Spark SQL strings: declarative, engine-portable, and safe to diff.

Spark recomputes everything from lineage, so persistence here serves the
reference's actual use case — saved workflows that re-execute later /
elsewhere — not fault tolerance."""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from knime_core_columnar_spark.table import ColumnarTable, RowIdPolicy

#: op name → required arg keys (validation at load time)
_OPS: dict[str, list[str]] = {
    "SOURCE": ["table"],
    "SELECT": ["columns"],
    "DROP": ["columns"],
    "KEEP_ONLY": ["columns"],
    "FILTER": ["predicate"],
    "SLICE": ["start", "stop"],
    "IDENTITY": [],
    "ROWINDEX": ["name"],
    "MAP": ["exprs"],
    "APPEND_MAP": ["exprs"],
    "REPLACE_MAP": ["name", "expr"],
    "APPEND_MISSING": ["columns"],
    "APPEND": ["tables"],
    "CONCATENATE": ["tables"],
    "RENAME": ["mapping"],
    "CAST": ["casts"],
}


@dataclass
class PlanStep:
    op: str
    args: dict[str, Any] = field(default_factory=dict)

    def validate(self) -> None:
        if self.op not in _OPS:
            raise ValueError(f"unknown plan op {self.op!r}; known: {sorted(_OPS)}")
        missing = [k for k in _OPS[self.op] if k not in self.args]
        if missing:
            raise ValueError(f"plan op {self.op} missing args {missing}")


@dataclass
class Plan:
    """A persistable transform pipeline: SOURCE step first, then
    structural steps. ``sources`` maps logical table names to loader
    info resolved at execution time (re-sourcing ≅ TableTransform.reSource,
    VirtualTableExtensionTable.java:323-334)."""

    steps: list[PlanStep] = field(default_factory=list)
    version: int = 1

    # -- construction -------------------------------------------------------

    def add(self, op: str, **args) -> "Plan":
        step = PlanStep(op, args)
        step.validate()
        self.steps.append(step)
        return self

    # -- persistence --------------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(
            {"version": self.version,
             "steps": [{"op": s.op, "args": s.args} for s in self.steps]},
            indent=2,
        )

    @classmethod
    def from_json(cls, text: str) -> "Plan":
        data = json.loads(text)
        plan = cls(version=data.get("version", 1))
        for s in data["steps"]:
            plan.add(s["op"], **s["args"])
        return plan

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Plan":
        with open(path) as f:
            return cls.from_json(f.read())

    # -- execution ----------------------------------------------------------

    def execute(
        self,
        spark: SparkSession,
        sources: dict[str, str | ColumnarTable],
        key_columns: dict[str, list[str]] | None = None,
    ) -> ColumnarTable:
        """Run the plan. ``sources`` resolves logical names to parquet
        paths or live tables (the UUID→RowAccessible map of the
        reference's executor, GraphVirtualTableExecutor usage at
        VirtualTableExtensionTable.java:473-492)."""
        key_columns = key_columns or {}

        def resolve(name: str) -> ColumnarTable:
            src = sources[name]
            if isinstance(src, ColumnarTable):
                return src
            return ColumnarTable.from_parquet(spark, src, key_columns=key_columns.get(name))

        table: ColumnarTable | None = None
        for step in self.steps:
            a = step.args
            if step.op == "SOURCE":
                table = resolve(a["table"])
                continue
            if table is None:
                raise ValueError("plan must start with a SOURCE step")
            if step.op == "SELECT":
                table = table.select_columns(*a["columns"])
            elif step.op == "DROP":
                table = table.drop_columns(*a["columns"])
            elif step.op == "KEEP_ONLY":
                table = table.keep_only_columns(*a["columns"])
            elif step.op == "FILTER":
                table = table.filter_rows(a["predicate"])
            elif step.op == "SLICE":
                table = table.slice(a["start"], a["stop"], order_by=a.get("order_by"))
            elif step.op == "IDENTITY":
                table = table.identity()
            elif step.op == "ROWINDEX":
                table = table.append_row_index(
                    a["name"], offset=a.get("offset", 0), order_by=a.get("order_by")
                )
            elif step.op == "MAP":
                table = table.map(a["exprs"])
            elif step.op == "APPEND_MAP":
                table = table.append_map(a["exprs"])
            elif step.op == "REPLACE_MAP":
                table = table.replace_map(a["name"], a["expr"])
            elif step.op == "APPEND_MISSING":
                table = table.append_missing_value_columns(a["columns"])
            elif step.op == "APPEND":
                table = table.append(
                    [resolve(t) for t in a["tables"]], validate=a.get("validate", True)
                )
            elif step.op == "CONCATENATE":
                table = table.concatenate(
                    [resolve(t) for t in a["tables"]],
                    row_id_policy=RowIdPolicy(a.get("row_id_policy", "fail")),
                )
            elif step.op == "RENAME":
                table = table.rename_columns(a["mapping"])
            elif step.op == "CAST":
                table = table.cast_columns(a["casts"])
        if table is None:
            raise ValueError("empty plan")
        return table
