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
    # ENGINE EXTENSION (round-11): equi-join of the running table with a
    # named side source — compiled from the Joiner workflow node
    # (plans/workflow.py). NOT part of the reference's persisted IR
    # (TableTransformNodeSettingsPersistor.java:374-476 has no join
    # transform — joins are workflow NODES there, not table-backend
    # transforms), so save_knime_settings refuses it; Plan.to_json
    # carries it natively.
    "JOIN": ["table", "left_on", "right_on", "how"],
    # ENGINE EXTENSION (round-11): top-k selection — compiled from the
    # Top k Selector workflow node. mode "rows" is TakeOrdered with the
    # RowID as the deterministic tie-break (a valid instance of the
    # node's arbitrary tie handling that stays stable at any
    # parallelism); mode "unique" keeps every row whose order-column
    # tuple is among the k best DISTINCT tuples, via a k-row broadcast
    # join — never a global window. Same save refusal as JOIN.
    "TOPK": ["columns", "ascending", "k"],
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
            elif step.op == "JOIN":
                from pyspark.sql import functions as F

                from ..operators.relational import join as _rel_join

                right = resolve(a["table"])
                lon, ron = list(a["left_on"]), list(a["right_on"])
                if lon == ron:
                    on: object = lon
                else:
                    # pairwise equality over differently-named columns;
                    # the l/r aliases are the ones join() binds
                    cond = None
                    for lc, rc in zip(lon, ron):
                        e = F.col(f"l.{lc}") == F.col(f"r.{rc}")
                        cond = e if cond is None else (cond & e)
                    on = cond
                table = _rel_join(
                    table, right, on=on, how=a["how"],
                    row_key=a.get("row_key", "concat"),
                )
            elif step.op == "TOPK":
                from pyspark.sql import functions as F

                from ..schema import ROW_KEY

                cols = list(a["columns"])
                asc = list(a["ascending"])
                k = int(a["k"])
                order = [F.col(c).asc() if up else F.col(c).desc()
                         for c, up in zip(cols, asc)]
                if a.get("mode", "rows") == "unique":
                    # k best DISTINCT order-tuples (TakeOrdered on the
                    # distinct frame), broadcast null-safe-joined back —
                    # deterministic under ties, no global window/sort
                    best = (table.df.select(*cols).distinct()
                            .orderBy(*order).limit(k))
                    cond = None
                    for c in cols:
                        e = table.df[c].eqNullSafe(best[c])
                        cond = e if cond is None else (cond & e)
                    table = type(table)(
                        table.df.join(F.broadcast(best), cond, "left_semi")
                    )
                else:
                    # exactly k rows; RowID breaks order ties so the
                    # result is stable at any parallelism
                    table = type(table)(
                        table.df.orderBy(*order, F.col(ROW_KEY).asc())
                        .limit(k)
                    )
        if table is None:
            raise ValueError("empty plan")
        return table


# ---------------------------------------------------------------------------
# KNIME NodeSettings interop (round 9)
# ---------------------------------------------------------------------------
#
# The reference persists transform DAGs as a NodeSettings tree
# (TableTransformNodeSettingsPersistor.java:121-150 save / :232-280
# load): root carries "version", a "transforms" config (children keyed
# "0", "1", ... each {type, internal}) and a "connections" config
# (children {from: {transform}, to: {transform, port}}); the persisted
# type catalog is the TransformSpecPersistor enum (:374-476). KNIME
# serializes NodeSettings as settings.xml (<config>/<entry> trees with
# the array-size convention for primitive arrays). The two functions
# below consume exactly that shape — settings.xml text or the
# equivalent nested dict — and produce an executable :class:`Plan`, so
# a workflow saved by the reference backend re-executes on Spark.

#: KNIME settings.xml <entry type=...> decoders
_XML_ENTRY_TYPES = {
    "xstring": lambda v: v,
    "xint": int,
    "xlong": int,
    "xshort": int,
    "xbyte": int,
    "xdouble": float,
    "xfloat": float,
    "xboolean": lambda v: v == "true",
    "xchar": lambda v: v,
}


def parse_knime_settings_xml(text: str) -> dict:
    """Parse KNIME settings.xml (org.knime.core.node.config XML
    serialization) into the nested-dict NodeSettings shape
    :func:`load_knime_settings` consumes. Handles <entry> primitives,
    nested <config>, and the array-size convention (a config whose
    children are 'array-size' plus '0'..'n-1' entries collapses to a
    Python list)."""
    import xml.etree.ElementTree as ET

    def strip_ns(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def walk(el) -> dict | list:
        out: dict[str, Any] = {}
        for child in el:
            tag = strip_ns(child.tag)
            key = child.get("key")
            if tag == "entry":
                typ = child.get("type")
                if typ not in _XML_ENTRY_TYPES:
                    raise ValueError(f"unknown settings.xml entry type {typ!r}")
                val = child.get("value")
                out[key] = (
                    None if child.get("isnull") == "true"
                    else _XML_ENTRY_TYPES[typ](val)
                )
            elif tag == "config":
                out[key] = walk(child)
            else:
                raise ValueError(f"unexpected settings.xml element {tag!r}")
        if "array-size" in out:
            n = out["array-size"]
            return [out[str(i)] for i in range(n)]
        return out

    root = ET.fromstring(text)
    return walk(root)  # type: ignore[return-value]


#: KNIME cell class (DataType.save's "cell_class") ↔ Spark SQL type,
#: plus the matching knime-core ValueFactory class — the public
#: org.knime.core.data primitive catalog
_CELL_CLASS_TO_SPARK = {
    "org.knime.core.data.def.IntCell": "int",
    "org.knime.core.data.def.LongCell": "bigint",
    "org.knime.core.data.def.DoubleCell": "double",
    "org.knime.core.data.def.StringCell": "string",
    "org.knime.core.data.def.BooleanCell": "boolean",
}
_SPARK_TO_CELL_CLASS = {v: k for k, v in _CELL_CLASS_TO_SPARK.items()}
_SPARK_TO_CELL_CLASS["long"] = _SPARK_TO_CELL_CLASS["bigint"]
_CELL_TO_VALUE_FACTORY = {
    "org.knime.core.data.def.IntCell":
        "org.knime.core.data.v2.value.IntValueFactory",
    "org.knime.core.data.def.LongCell":
        "org.knime.core.data.v2.value.LongValueFactory",
    "org.knime.core.data.def.DoubleCell":
        "org.knime.core.data.v2.value.DoubleValueFactory",
    "org.knime.core.data.def.StringCell":
        "org.knime.core.data.v2.value.StringValueFactory",
    "org.knime.core.data.def.BooleanCell":
        "org.knime.core.data.v2.value.BooleanValueFactory",
}
_VALUE_FACTORY_TO_CELL = {v: k for k, v in _CELL_TO_VALUE_FACTORY.items()}


def _load_missing_columns_schema(internal: dict) -> dict[str, str]:
    """Parse the persisted ValueSchema of an APPEND_MISSING transform
    (TableTransformNodeSettingsPersistor.java:544-556
    loadMissingColumnsSchema): ``data_table_spec`` is a saved
    DataTableSpec (public knime-core layout — spec_name/number_columns/
    column_spec_<i> with column_name + column_type.cell_class) and
    ``value_factories`` holds one saved ValueFactory per column, keyed
    "0".."n-1". Types come from the cell class; when a per-column
    factory config names a known ValueFactory that contradicts the cell
    class, loading raises rather than guessing. Returns the
    ``{name: spark_type}`` dict the APPEND_MISSING plan step executes."""
    dts = internal.get("data_table_spec")
    if not isinstance(dts, dict):
        raise ValueError(
            "APPEND_MISSING transform is missing its data_table_spec "
            "config (saveMissingColumnsSchema writes one, "
            "TableTransformNodeSettingsPersistor.java:524-542)"
        )
    n = int(dts.get("number_columns", 0))
    factories = internal.get("value_factories", {}) or {}
    out: dict[str, str] = {}
    for i in range(n):
        spec = dts.get(f"column_spec_{i}")
        if not isinstance(spec, dict):
            raise ValueError(
                f"APPEND_MISSING data_table_spec declares "
                f"{n} columns but column_spec_{i} is absent"
            )
        name = spec["column_name"]
        cell = spec.get("column_type", {}).get("cell_class", "")
        spark_type = _CELL_CLASS_TO_SPARK.get(cell)
        if spark_type is None:
            raise ValueError(
                f"APPEND_MISSING column {name!r}: no Spark mapping for "
                f"cell class {cell!r} (supported: "
                f"{sorted(_CELL_CLASS_TO_SPARK)})"
            )
        fac_cfg = factories.get(str(i))
        if isinstance(fac_cfg, dict):
            named = [v for v in fac_cfg.values() if isinstance(v, str)
                     and v in _VALUE_FACTORY_TO_CELL]
            if named and _VALUE_FACTORY_TO_CELL[named[0]] != cell:
                raise ValueError(
                    f"APPEND_MISSING column {name!r}: saved value "
                    f"factory {named[0]!r} contradicts cell class "
                    f"{cell!r}"
                )
        out[name] = spark_type
    return out


def _save_missing_columns_schema(columns) -> dict:
    """Inverse of :func:`_load_missing_columns_schema` — the persistor's
    saveMissingColumnsSchema shape
    (TableTransformNodeSettingsPersistor.java:524-542): a RowID-less
    DataTableSpec under ``data_table_spec`` plus one ValueFactory per
    column under ``value_factories``. ``columns`` is the plan step's
    ``{name: spark_type}`` dict (or a StructType)."""
    try:  # StructType → items; plain dicts of type strings stay as-is
        from pyspark.sql import types as _T

        if isinstance(columns, _T.StructType):
            columns = {f.name: f.dataType.simpleString()
                       for f in columns.fields}
        else:
            columns = {
                k: (v.simpleString() if isinstance(v, _T.DataType) else v)
                for k, v in columns.items()
            }
    except ImportError:  # pragma: no cover — pyspark always present
        columns = dict(columns)
    dts: dict[str, Any] = {
        "spec_name": "default",
        "number_columns": len(columns),
    }
    factories: dict[str, Any] = {}
    for i, (name, spark_type) in enumerate(columns.items()):
        cell = _SPARK_TO_CELL_CLASS.get(str(spark_type).lower())
        if cell is None:
            raise ValueError(
                "save_knime_settings: APPEND_MISSING column "
                f"{name!r} has Spark type {spark_type!r} with no KNIME "
                "cell-class mapping (supported: "
                f"{sorted(_SPARK_TO_CELL_CLASS)}); use Plan.to_json for "
                "the native format"
            )
        dts[f"column_spec_{i}"] = {
            "column_name": name,
            "column_type": {"cell_class": cell},
        }
        factories[str(i)] = {
            "value_factory_class": _CELL_TO_VALUE_FACTORY[cell],
        }
    return {"data_table_spec": dts, "value_factories": factories}


def load_knime_settings(
    settings: dict | str,
    mapper_registry: dict[str, Any] | None = None,
    select_convention: str | None = None,
) -> Plan:
    """Load a transform DAG saved by the reference's
    TableTransformNodeSettingsPersistor into an executable :class:`Plan`.

    ``settings`` is settings.xml text or the equivalent nested dict:
    ``{"version": 1, "transforms": {"0": {"type": ..., "internal":
    {...}}, ...}, "connections": {"0": {"from": {"transform": i},
    "to": {"transform": j, "port": p}}, ...}}``.

    Supported types mirror the persistor enum
    (TableTransformNodeSettingsPersistor.java:374-476): SOURCE
    (internal.identifier — becomes the Plan's source name), SELECT
    (internal.included_columns, int indices over the full ValueSchema
    in which the RowKey is column 0 — the reference's backend persists
    SelectColumnsTransformSpec selections over ValueSchema indices,
    ColumnarVirtualTable.selectColumns → ValueSchemaUtils.selectColumns
    with the RowKey-at-column-0 invariant asserted at
    ColumnarVirtualTable.java:569-580; this loader requires index 0 to
    be present and first, strips it, and shifts the data indices down
    by one because this engine's RowID travels implicitly — a SELECT
    that drops the RowKey is inexpressible here and raises), SLICE
    (internal.from/to), ROWINDEX (internal.offset), IDENTITY, APPEND,
    CONCATENATE (empty internals; extra inputs must be SOURCE nodes —
    the linear-pipeline restriction of :class:`Plan`), and
    MAP / APPEND_MAP via ``mapper_registry``: a dict mapping the
    persisted ``mapper_factory_class`` name to a callable
    ``(mapper_factory_settings, column_indices) -> exprs dict`` — the
    Python mirror of the reference's PersistenceRegistry extension
    point (Persistor.load), with Spark SQL strings taking the place of
    compiled mapper factories.

    APPEND_MISSING loads the persisted RowID-less ValueSchema
    (data_table_spec + value_factories,
    TableTransformNodeSettingsPersistor.java:476-488) into the Plan's
    APPEND_MISSING step via :func:`_load_missing_columns_schema`.

    ``select_convention`` adjudicates how SELECT included_columns are
    read: ``"value_schema"`` (the reference's convention, RowKey = 0 —
    the default) or ``"data_column"`` (0 = first data column — the
    convention THIS engine wrote before its round-10 fix; the settings
    version stayed 1 across that fix, so old self-written files are
    indistinguishable from reference files by version alone). Files
    saved by the current :func:`save_knime_settings` carry a
    ``select_convention`` marker entry that resolves it automatically
    (the reference loader reads only the keys it knows, so the extra
    entry is inert there); for unmarked legacy self-written files pass
    ``select_convention="data_column"`` explicitly — or re-save once.

    The DAG must be single-sink and linearizable (every non-port-0
    input is a SOURCE) — true of everything the reference's own
    persistor test corpus saves; anything else raises ValueError.
    """
    if isinstance(settings, str):
        settings = parse_knime_settings_xml(settings)
    mapper_registry = mapper_registry or {}
    if select_convention is None:
        select_convention = settings.get("select_convention", "value_schema")
    if select_convention not in ("value_schema", "data_column"):
        raise ValueError(
            f"unknown select_convention {select_convention!r} "
            "(expected 'value_schema' or 'data_column')"
        )

    # Pre-AP-5.3 settings carry no "version" key (the reference defaults
    # to 0, TableTransformNodeSettingsPersistor.java:230-233). The only
    # thing the reference's version-0 compat path actually changes is the
    # rewrite of MapperWithRowIndexFactory MAP nodes into
    # ROWINDEX+MAP+SELECT (:259-280) — version-0 trees made of
    # SOURCE/SELECT/SLICE/... load identically to version-1 there. We
    # don't implement that rewrite (we can't tell which persisted mapper
    # factories are row-index mappers), so refuse exactly the trees it
    # could apply to: version-0 WITH a MAP/APPEND_MAP node. Rewrite-free
    # version-0 files the reference accepts load normally.
    version = settings.get("version", 0)
    if version < 1 and any(
        t.get("type") in ("MAP", "APPEND_MAP")
        for t in settings.get("transforms", {}).values()
    ):
        raise ValueError(
            f"settings version {version} predates AP 5.3 and contains a "
            "MAP transform; the reference loader rewrites its "
            "MapperWithRowIndexFactory MAP nodes "
            "(TableTransformNodeSettingsPersistor.java:259-280), which "
            "this loader does not implement — re-save with a current "
            "KNIME AP first"
        )

    transforms = {
        int(k): v for k, v in settings.get("transforms", {}).items()
    }
    inputs: dict[int, dict[int, int]] = {}
    is_input_of: set[int] = set()
    for conn in settings.get("connections", {}).values():
        frm = conn["from"]["transform"]
        to = conn["to"]["transform"]
        port = conn["to"]["port"]
        inputs.setdefault(to, {})[port] = frm
        is_input_of.add(frm)

    sinks = [i for i in transforms if i not in is_input_of]
    if len(sinks) != 1:
        raise ValueError(f"expected exactly one sink transform, got {sinks}")

    def source_name(idx: int) -> str:
        node = transforms[idx]
        if node["type"] != "SOURCE":
            raise ValueError(
                f"transform {idx}: non-port-0 inputs must be SOURCE nodes "
                f"(linear-pipeline restriction), got {node['type']!r}"
            )
        return node["internal"]["identifier"]

    # walk the port-0 spine from the sink back to its source
    chain: list[int] = []
    cur: int | None = sinks[0]
    while cur is not None:
        chain.append(cur)
        cur = inputs.get(cur, {}).get(0)
    chain.reverse()

    plan = Plan(version=settings.get("version", 1))
    for idx in chain:
        node = transforms[idx]
        typ = node["type"]
        internal = node.get("internal", {}) or {}
        side = [
            source_name(frm)
            for port, frm in sorted(inputs.get(idx, {}).items())
            if port != 0
        ]
        if typ == "SOURCE":
            plan.add("SOURCE", table=internal["identifier"])
        elif typ == "SELECT":
            if select_convention == "data_column":
                # legacy self-written files (pre-round-10): indices are
                # already data-column positions, RowID implicit
                plan.add("SELECT",
                         columns=list(internal["included_columns"]))
                continue
            # included_columns are ValueSchema indices (RowKey = 0); see
            # the docstring. Require the RowKey first, shift the rest.
            vs_cols = list(internal["included_columns"])
            if not vs_cols or vs_cols[0] != 0:
                raise ValueError(
                    f"transform {idx}: SELECT included_columns={vs_cols} "
                    "does not keep the RowKey (ValueSchema column 0) "
                    "first; this engine's RowID is implicit and cannot "
                    "be dropped or reordered by SELECT. If this file was "
                    "saved by this engine before its round-10 convention "
                    "fix, reload with select_convention='data_column'."
                )
            if any(c <= 0 for c in vs_cols[1:]):
                raise ValueError(
                    f"transform {idx}: SELECT included_columns={vs_cols} "
                    "repeats or misorders ValueSchema index 0 (RowKey)"
                )
            plan.add("SELECT", columns=[c - 1 for c in vs_cols[1:]])
        elif typ == "SLICE":
            plan.add("SLICE", start=internal["from"], stop=internal["to"])
        elif typ == "ROWINDEX":
            plan.add(
                "ROWINDEX", name="row_index",
                offset=internal.get("offset", 0),
            )
        elif typ == "IDENTITY":
            plan.add("IDENTITY")
        elif typ == "APPEND_MISSING":
            plan.add("APPEND_MISSING",
                     columns=_load_missing_columns_schema(internal))
        elif typ == "APPEND":
            plan.add("APPEND", tables=side)
        elif typ == "CONCATENATE":
            plan.add("CONCATENATE", tables=side)
        elif typ in ("MAP", "APPEND_MAP"):
            cls = internal["mapper_factory_class"]
            if cls in mapper_registry:
                exprs = mapper_registry[cls](
                    internal.get("mapper_factory_settings", {}),
                    list(internal.get("column_indices", [])),
                )
            elif cls == SQL_EXPRS_MAPPER_CLASS:
                # this engine's own mapper encoding (save_knime_settings):
                # the exprs dict IS the factory settings
                exprs = dict(
                    internal["mapper_factory_settings"]["exprs"]
                )
            else:
                raise ValueError(
                    f"no persistor registered for mapper factory {cls!r} "
                    "(pass mapper_registry — the PersistenceRegistry "
                    "extension-point mirror)"
                )
            plan.add(typ, exprs=exprs)
        else:
            raise ValueError(f"unsupported persisted transform type {typ!r}")
    return plan


#: the mapper_factory_class this engine writes for MAP/APPEND_MAP steps
#: (Spark SQL expression strings instead of a compiled Java factory);
#: load_knime_settings resolves it without a registry entry, so
#: save -> load roundtrips out of the box. A JVM KNIME instance would
#: need a Persistor registered under this name at its extension point.
SQL_EXPRS_MAPPER_CLASS = "knime_core_columnar_spark.plans.SqlExprsMapperFactory"


def save_knime_settings(plan: Plan) -> dict:
    """Serialize a :class:`Plan` into the reference's NodeSettings tree
    shape (the inverse of :func:`load_knime_settings`): root {version,
    transforms, connections}; side tables of APPEND/CONCATENATE become
    SOURCE transforms wired in on ports >= 1, exactly like the
    reference's traversal (TableTransformNodeSettingsPersistor.java:
    121-165 — ids here number the primary chain first and side sources
    on demand; ids are arbitrary labels, the connections carry the
    graph, and the reference loader resolves by id). Only the
    reference's persisted IR subset is expressible — SOURCE, SELECT
    (integer columns, written as ValueSchema indices: RowKey 0 first,
    data column i as i+1), SLICE/ROWINDEX only without order_by (the
    reference specs carry from/to resp. offset alone — an order_by or a
    non-default ROWINDEX name raises instead of silently dropping
    semantics), IDENTITY, APPEND, CONCATENATE, APPEND_MISSING (the
    RowID-less ValueSchema as data_table_spec + value_factories,
    TableTransformNodeSettingsPersistor.java:476-488; primitive
    column types only — anything unmappable raises),
    MAP/APPEND_MAP (saved under :data:`SQL_EXPRS_MAPPER_CLASS` with the
    exprs dict as mapper_factory_settings); anything else raises."""
    transforms: dict[str, dict] = {}
    connections: dict[str, dict] = {}
    n_conn = 0

    def add_transform(node: dict) -> int:
        tid = len(transforms)
        transforms[str(tid)] = node
        return tid

    def connect(frm: int, to: int, port: int) -> None:
        nonlocal n_conn
        connections[str(n_conn)] = {
            "from": {"transform": frm},
            "to": {"transform": to, "port": port},
        }
        n_conn += 1

    prev: int | None = None
    for step in plan.steps:
        a = step.args
        if step.op == "SOURCE":
            node = {"type": "SOURCE",
                    "internal": {"identifier": a["table"]}}
        elif step.op == "SELECT":
            cols = a["columns"]
            if not all(isinstance(c, int) for c in cols):
                raise ValueError(
                    "save_knime_settings: SELECT must use integer column "
                    "indices (the reference persists included_columns as "
                    f"an int array), got {cols!r}"
                )
            # persist as ValueSchema indices (RowKey at 0, data at i+1) —
            # the convention the reference backend writes; see
            # load_knime_settings for the inverse translation.
            node = {"type": "SELECT",
                    "internal": {"included_columns":
                                 [0] + [c + 1 for c in cols]}}
        elif step.op == "SLICE":
            if a.get("order_by") is not None:
                raise ValueError(
                    "save_knime_settings: SLICE order_by has no slot in "
                    "the reference's persisted SliceTransformSpec "
                    "(from/to only) — dropping it would silently select "
                    "different rows; use Plan.to_json for the native "
                    "format"
                )
            node = {"type": "SLICE",
                    "internal": {"from": a["start"], "to": a["stop"]}}
        elif step.op == "ROWINDEX":
            if a.get("order_by") is not None:
                raise ValueError(
                    "save_knime_settings: ROWINDEX order_by has no slot "
                    "in the reference's persisted RowIndexTransformSpec "
                    "(offset only) — dropping it would silently number "
                    "rows in a different order; use Plan.to_json"
                )
            if a.get("name", "row_index") != "row_index":
                raise ValueError(
                    "save_knime_settings: ROWINDEX column name "
                    f"{a['name']!r} is not persistable (the reference "
                    "spec carries only the offset; the loader always "
                    "restores the default 'row_index' name)"
                )
            node = {"type": "ROWINDEX",
                    "internal": {"offset": a.get("offset", 0)}}
        elif step.op == "IDENTITY":
            node = {"type": "IDENTITY", "internal": {}}
        elif step.op == "APPEND_MISSING":
            node = {"type": "APPEND_MISSING",
                    "internal": _save_missing_columns_schema(a["columns"])}
        elif step.op in ("APPEND", "CONCATENATE"):
            node = {"type": step.op, "internal": {}}
        elif step.op in ("MAP", "APPEND_MAP"):
            node = {"type": step.op, "internal": {
                "column_indices": [],
                "mapper_factory_class": SQL_EXPRS_MAPPER_CLASS,
                "mapper_factory_settings": {"exprs": dict(a["exprs"])},
            }}
        else:
            raise ValueError(
                f"save_knime_settings: {step.op} is outside the "
                "reference's persisted IR catalog "
                "(TableTransformNodeSettingsPersistor.java:374-476); "
                "use Plan.to_json for the native format"
            )
        tid = add_transform(node)
        if prev is not None:
            connect(prev, tid, 0)
        if step.op in ("APPEND", "CONCATENATE"):
            for port, name in enumerate(a["tables"], start=1):
                sid = add_transform(
                    {"type": "SOURCE", "internal": {"identifier": name}}
                )
                connect(sid, tid, port)
        prev = tid
    # select_convention is an engine marker (the reference loader reads
    # only the keys it knows, so this entry is inert there): it lets
    # load_knime_settings distinguish current files (SELECT indices over
    # the ValueSchema, RowKey = 0) from this engine's pre-round-10 files
    # (data-column indices) that share version 1 — see the ADVICE-driven
    # migration note in load_knime_settings.
    return {"version": plan.version, "select_convention": "value_schema",
            "transforms": transforms, "connections": connections}


#: keys the reference writes as longs (SLICE range, ROWINDEX offset)
_XML_LONG_KEYS = {"from", "to", "offset"}


def serialize_knime_settings_xml(tree: dict, root_key: str = "root") -> str:
    """Render a NodeSettings dict as KNIME settings.xml
    (org.knime.core.node.config serialization — the byte format KNIME
    workflows store on disk). Inverse of
    :func:`parse_knime_settings_xml`; int lists use the array-size
    convention."""
    from xml.sax.saxutils import quoteattr

    lines = ['<?xml version="1.0" encoding="UTF-8"?>']

    def emit(key: str, val, depth: int) -> None:
        pad = "  " * depth
        k = quoteattr(str(key))
        if isinstance(val, dict):
            lines.append(f"{pad}<config key={k}>")
            for ck, cv in val.items():
                emit(ck, cv, depth + 1)
            lines.append(f"{pad}</config>")
        elif isinstance(val, list):
            if not all(isinstance(x, int) for x in val):
                raise ValueError(
                    f"settings.xml arrays must be int arrays, got {val!r}"
                )
            lines.append(f"{pad}<config key={k}>")
            lines.append(
                f'{pad}  <entry key="array-size" type="xint" '
                f'value="{len(val)}"/>'
            )
            for i, x in enumerate(val):
                lines.append(
                    f'{pad}  <entry key="{i}" type="xint" value="{x}"/>'
                )
            lines.append(f"{pad}</config>")
        else:
            if isinstance(val, bool):
                typ, txt = "xboolean", ("true" if val else "false")
            elif isinstance(val, int):
                typ = "xlong" if key in _XML_LONG_KEYS else "xint"
                txt = str(val)
            elif isinstance(val, float):
                typ, txt = "xdouble", repr(val)
            elif val is None:
                lines.append(
                    f'{pad}<entry key={k} type="xstring" isnull="true" '
                    'value=""/>'
                )
                return
            else:
                typ, txt = "xstring", str(val)
            v = quoteattr(txt)
            lines.append(f'{pad}<entry key={k} type="{typ}" value={v}/>')

    lines.append(
        '<config xmlns="http://www.knime.org/2008/09/XMLConfig" '
        f'key={quoteattr(root_key)}>'
    )
    for k, v in tree.items():
        emit(k, v, 1)
    lines.append("</config>")
    return "\n".join(lines) + "\n"
