"""Differential fuzz for the round-11 workflow DAG compiler: random
two-branch workflows (Row Filter / String Manipulation chains feeding a
Concatenate or Joiner) are written to disk in KNIME's on-disk shape,
compiled by plans.workflow.load_workflow_program, executed on Spark —
and compared row-for-row against an independent pandas replica that
reimplements the NODE semantics (SQL three-valued filters, the
UNIQUIFY '_dup' election with first-table-wins order, join modes where
a null key never matches). The replica shares no code with the
compiler or the engine, so a divergence in either the settings.xml
translation or the execution is a red test, same discipline as
test_fuzz_dsl_translation_matches_python_replica.

Deliberately pinned edge semantics:
- comparison filters DROP null rows (SQL), IS_MISSING keeps them;
- pandas merge would match NaN keys to each other — the replica
  splits null-key rows out first because the engine (SQL equality)
  never matches them, surfacing them only through outer modes;
- '_dup' goes to the LATER table's colliding key (first table wins),
  matching ColumnarConcatenater.java:252-292 order.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import assume, given, settings as hyp_settings
from hypothesis import strategies as st

from tests.test_knime_workflow import (
    _column_filter_xml,
    _concatenate_xml,
    _csv_reader_xml,
    _joiner_xml,
    _row_filter_xml,
    _workflow_knime,
    _XML_HEAD,
)

# ---------------------------------------------------------------------------
# data: fixed frames with key collisions and null cells
# ---------------------------------------------------------------------------

_A_ROWS = [  # (_row_key, k, s)
    ("r0", 0, "alpha"), ("r1", 3, None), ("r2", 5, "Beta"),
    ("r3", None, "gamma"), ("r4", 7, "DELTA"), ("r5", 3, "eps"),
]
_B_CONCAT_ROWS = [  # same columns as A; r1/r2 collide with A's keys
    ("r1", 2, "zeta"), ("r2", None, "Eta"), ("b0", 5, None),
    ("b1", 9, "theta"),
]
_B_JOIN_ROWS = [  # (_row_key, k2, t)
    ("j0", 3, "one"), ("j1", 5, None), ("j2", None, "two"),
    ("j3", 11, "Three"),
]


def _string_manip_xml(expr: str, target: str, append: bool) -> str:
    b = "true" if append else "false"
    expr = expr.replace("&", "&amp;").replace('"', "&quot;")
    return (
        _XML_HEAD
        + f'''<config xmlns="http://www.knime.org/2008/09/XMLConfig" key="settings.xml">
    <entry key="factory" type="xstring" value="org.knime.base.node.preproc.stringmanipulation.StringManipulationNodeFactory"/>
    <config key="model">
        <entry key="expression" type="xstring" value="{expr}"/>
        <entry key="replaced_column" type="xstring" value="{target}"/>
        <entry key="append_column" type="xboolean" value="{b}"/>
    </config>
</config>
''')


# ---------------------------------------------------------------------------
# replica: node semantics in pandas, independent of the compiler/engine
# ---------------------------------------------------------------------------


def _is_null(v) -> bool:
    return v is None or (isinstance(v, float) and math.isnan(v))


def _apply_filter_replica(rows, col_idx, op, value):
    out = []
    for r in rows:
        v = r[col_idx]
        if op == "IS_MISSING":
            keep = _is_null(v)
        elif op == "IS_NOT_MISSING":
            keep = not _is_null(v)
        elif _is_null(v):
            keep = False  # SQL three-valued: null comparisons drop
        elif op == "GT":
            keep = v > value
        elif op == "LT":
            keep = v < value
        elif op == "EQ":
            keep = v == value
        else:  # NEQ
            keep = v != value
        if keep:
            out.append(r)
    return out


def _apply_case_replica(rows, col_idx, fn, append):
    out = []
    for r in rows:
        v = r[col_idx]
        nv = None if _is_null(v) else (v.upper() if fn == "upperCase"
                                       else v.lower())
        r = list(r)
        if append:
            r.append(nv)
        else:
            r[col_idx] = nv
        out.append(tuple(r))
    return out


def _concat_replica(a_rows, b_rows):
    seen = {r[0] for r in a_rows}
    out = list(a_rows)
    for r in b_rows:
        key = r[0]
        while key in seen:
            key = key + "_dup"
        seen.add(key)
        out.append((key, *r[1:]))
    return out


def _join_replica(a_rows, b_rows, how, a_width, b_width):
    """Inner/left/right/full with SQL null-key semantics and the
    engine's concat/fallback row keys. a rows are (_row_key, k, ...),
    b rows (_row_key, k2, ...). Widths are passed analytically so an
    empty post-filter branch still pads unmatched rows correctly."""
    out = []
    matched_b = set()
    for ra in a_rows:
        ka = ra[1]
        hits = [] if _is_null(ka) else [
            rb for rb in b_rows if not _is_null(rb[1]) and rb[1] == ka]
        if hits:
            for rb in hits:
                matched_b.add(rb[0])
                out.append((f"{ra[0]}_{rb[0]}", *ra[1:], *rb[1:]))
        elif how in ("left", "full"):
            out.append((ra[0], *ra[1:], *([None] * (b_width - 1))))
    if how in ("right", "full"):
        for rb in b_rows:
            if rb[0] not in matched_b:
                out.append((rb[0], *([None] * (a_width - 1)), *rb[1:]))
    return out


def _norm(v):
    if _is_null(v):
        return None
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v


def _as_multiset(rows):
    return sorted(tuple(_norm(v) for v in r) for r in rows)


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

_filter_node = st.tuples(
    st.just("filter"),
    st.sampled_from(["GT", "LT", "EQ", "NEQ", "IS_MISSING",
                     "IS_NOT_MISSING"]),
    st.integers(min_value=0, max_value=9),
)
_case_node = st.tuples(
    st.just("case"),
    st.sampled_from(["upperCase", "lowerCase"]),
    st.booleans(),  # append?
)
_branch = st.lists(st.one_of(_filter_node, _case_node), max_size=2)

_scenario = st.one_of(
    st.tuples(st.just("concat"), _branch, _branch),
    st.tuples(st.sampled_from(["inner", "left", "right", "full"]),
              _branch, _branch),
)


def _branch_xmls(nodes, int_col, str_col, append_name):
    xmls = []
    for kind, *args in nodes:
        if kind == "filter":
            op, value = args
            xmls.append(_row_filter_xml(int_col, op, value))
        else:
            fn, append = args
            target = append_name if append else str_col
            xmls.append(_string_manip_xml(
                f"{fn}($" + str_col + "$)", target, append))
    return xmls


def _branch_replica(rows, nodes, int_idx, str_idx):
    for kind, *args in nodes:
        if kind == "filter":
            op, value = args
            rows = _apply_filter_replica(rows, int_idx, op, value)
        else:
            fn, append = args
            rows = _apply_case_replica(rows, str_idx, fn, append)
    return rows


def _width(nodes) -> int:
    """3 base columns (_row_key + int + string) plus one per
    append-mode String Manipulation node."""
    return 3 + sum(1 for kind, *args in nodes
                   if kind == "case" and args[1])


@pytest.fixture(scope="module")
def dag_frames(spark):
    a = spark.createDataFrame(_A_ROWS, "_row_key string, k int, s string")
    bc = spark.createDataFrame(
        _B_CONCAT_ROWS, "_row_key string, k int, s string")
    bj = spark.createDataFrame(
        _B_JOIN_ROWS, "_row_key string, k2 int, t string")
    return a, bc, bj


@hyp_settings(max_examples=60, deadline=None, derandomize=True)
@given(sc=_scenario)
def test_fuzz_dag_workflow_matches_pandas_replica(
    spark, tmp_path_factory, dag_frames, sc
):
    from knime_core_columnar_spark.table import ColumnarTable
    from knime_core_columnar_spark.plans.workflow import (
        load_workflow_program,
    )

    combiner, left_nodes, right_nodes = sc
    # at most one append per branch: a second append of the same target
    # name is a node-configuration error, not a semantics to pin
    for nodes in (left_nodes, right_nodes):
        assume(sum(1 for kind, *args in nodes
                   if kind == "case" and args[1]) <= 1)
    join_mode = combiner != "concat"
    a_df, bc_df, bj_df = dag_frames
    tmp = tmp_path_factory.mktemp("dagfuzz")

    cols_a = [("k", "java.lang.Integer"), ("s", "java.lang.String")]
    cols_b = ([("k2", "java.lang.Integer"), ("t", "java.lang.String")]
              if join_mode else cols_a)
    left_xmls = _branch_xmls(left_nodes, "k", "s", "u")
    # join mode: the right branch's appended column must not collide
    # with the left's (the Joiner compile refuses clashes by design);
    # concat mode NEEDS the same name so the union aligns by name
    right_xmls = _branch_xmls(right_nodes, "k2" if join_mode else "k",
                              "t" if join_mode else "s",
                              "w" if join_mode else "u")
    if join_mode:
        comb_xml = _joiner_xml(
            left_on=("k",), right_on=("k2",),
            left_unmatched=combiner in ("left", "full"),
            right_unmatched=combiner in ("right", "full"))
    else:
        comb_xml = _concatenate_xml(suffix_mode=True)

    # graph: 1=CSV A, then left chain, 2=CSV B, then right chain,
    # last = combiner
    files: dict[int, tuple[str, str]] = {}
    conns = []
    nid = 1
    files[nid] = ("CSV A (#1)", _csv_reader_xml("/data/a.csv", cols_a))
    left_tail = nid
    for i, xml in enumerate(left_xmls):
        nid += 1
        files[nid] = (f"L{i} (#{nid})", xml)
        conns.append((left_tail, nid, 1, 1))
        left_tail = nid
    nid += 1
    b_id = nid
    files[nid] = (f"CSV B (#{nid})", _csv_reader_xml("/data/b.csv", cols_b))
    right_tail = b_id
    for i, xml in enumerate(right_xmls):
        nid += 1
        files[nid] = (f"R{i} (#{nid})", xml)
        conns.append((right_tail, nid, 1, 1))
        right_tail = nid
    nid += 1
    files[nid] = (f"Combine (#{nid})", comb_xml)
    conns.append((left_tail, nid, 1, 1))
    conns.append((right_tail, nid, 1, 2))

    wf = tmp / "wf"
    for _, (d, xml) in files.items():
        (wf / d).mkdir(parents=True, exist_ok=True)
        (wf / d / "settings.xml").write_text(xml, encoding="utf-8")
    (wf / "workflow.knime").write_text(
        _workflow_knime({i: f"{d}/settings.xml"
                         for i, (d, _) in files.items()}, conns),
        encoding="utf-8")

    # append-mode String Manipulation on both branches of a Concatenate
    # yields differing schemas; engine union null-fills, replica would
    # need ragged rows — normalize by padding replica rows instead
    prog = load_workflow_program(str(wf))
    b_df = bj_df if join_mode else bc_df
    out = prog.execute(spark, {
        "source": ColumnarTable(a_df),
        "source_2": ColumnarTable(b_df),
    })
    got = _as_multiset([tuple(r) for r in out.df.collect()])

    left_rows = _branch_replica(list(_A_ROWS), left_nodes, 1, 2)
    right_rows = _branch_replica(
        list(_B_JOIN_ROWS if join_mode else _B_CONCAT_ROWS),
        right_nodes, 1, 2)
    if join_mode:
        want_rows = _join_replica(left_rows, right_rows, combiner,
                                  _width(left_nodes), _width(right_nodes))
    else:
        # union-by-name with null fill when exactly one branch appended
        width = max(_width(left_nodes), _width(right_nodes))
        left_rows = [(*r, *([None] * (width - len(r)))) for r in left_rows]
        right_rows = [(*r, *([None] * (width - len(r))))
                      for r in right_rows]
        want_rows = _concat_replica(left_rows, right_rows)
    want = _as_multiset(want_rows)
    assert got == want, (combiner, left_nodes, right_nodes)
