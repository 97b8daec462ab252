#!/usr/bin/env python3
"""One-shot refactoring script (round 6): split the 9.5k-line catalog.py
into knime_core_columnar_spark/catalog/ section modules along the
existing section-header boundaries, preserving registration order
exactly (VERDICT r5 next-round #7).

Mechanics:
- each module gets the shared import header plus auto-derived imports of
  top-level names it uses that are defined in EARLIER sections (detected
  via ast Name loads minus own top-level definitions);
- __init__.py (re)loads the sections in order and copies their public +
  private names into the package namespace, so `catalog.X` keeps working
  for every attribute tests/tools touch, and importlib.reload(catalog)
  behaves like reloading the old monolith.

Run once from the repo root; idempotence is not a goal (the script is
kept for audit, not re-use).
"""

from __future__ import annotations

import ast
import os

SRC = "knime_core_columnar_spark/catalog.py"
DST = "knime_core_columnar_spark/catalog"

# (module_name, first_line, last_line) — 1-indexed inclusive
SECTIONS = [
    ("_registry", 1, 155),
    ("core", 156, 1197),
    ("llm_text", 1198, 2081),
    ("tpch_more", 2082, 2871),
    ("widening_a", 2872, 4352),
    ("widening_b", 4353, 5952),
    ("partsupp", 5953, 6201),
    ("formats_graph", 6202, 6531),
    ("layout_r4", 6532, 6648),
    ("staged_r5", 6649, 6908),
    ("staged_r6", 6909, 7205),
    ("staged_r7", 7206, 7709),
    ("staged_r8", 7710, 8150),
    ("layout_r5", 8151, 8214),
    ("staged_r9", 8215, 9365),
    ("layout_final", 9366, None),
]

DOC = {
    "_registry": "Registry: QUERIES/ORACLES dicts, @query decorator, shared helpers.",
    "core": "Core algebra + relational surface + scalar function library (SURVEY 2.1/2.2/2.7).",
    "llm_text": "LLM-data-pipeline operators: text analysis, dedup, similarity, multimodal.",
    "tpch_more": "Additional TPC-H-adapted queries + approximate aggregates + nested types.",
    "widening_a": "Round-2 widening (part 1): analytic aggregates, ties, argmax, co-location.",
    "widening_b": "Round-2 widening (part 2): profiling, ML-lite, binning, monitors.",
    "partsupp": "partsupp TPC-H patterns (q2/q9/q11/q16/q20) - register when the table ships.",
    "formats_graph": "Avro interop + graph/sequence analytics (round-4 batch).",
    "layout_r4": "Round-4 driver window + cumulative r1-3 greens + initial reorder.",
    "staged_r5": "Round-5 staged queries + bpe_encode (registered round 6).",
    "staged_r6": "Round-6 staged queries.",
    "staged_r7": "Round-7 staged queries.",
    "staged_r8": "Round-8 staged queries.",
    "layout_r5": "Round-5 window + the shared _reorder_for_window + apply_round5_layout.",
    "staged_r9": "Round-9 staged queries.",
    "layout_final": "Round-6/7 windows and layout flips (apply_round6_layout runs at import).",
}

HEADER_IMPORTS = """
from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knime_core_columnar_spark.schema import ROW_KEY
from knime_core_columnar_spark.table import ColumnarTable, RowIdPolicy
"""


def top_level_defs(tree: ast.Module) -> set[str]:
    names: set[str] = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names.add(t.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names.add(node.target.id)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for a in node.names:
                names.add((a.asname or a.name).split(".")[0])
    return names


def used_names(tree: ast.Module) -> set[str]:
    return {
        n.id for n in ast.walk(tree) if isinstance(n, ast.Name)
    }


def main() -> None:
    lines = open(SRC).read().splitlines(keepends=True)
    os.makedirs(DST, exist_ok=True)

    defined_by: dict[str, str] = {}  # name -> module that defines it (first wins... last wins like monolith)
    module_order: list[str] = []
    bodies: dict[str, str] = {}
    trees: dict[str, ast.Module] = {}

    for name, a, b in SECTIONS:
        body = "".join(lines[a - 1 : (b if b is not None else len(lines))])
        bodies[name] = body
        trees[name] = ast.parse(body)
        module_order.append(name)

    own_defs = {m: top_level_defs(trees[m]) for m in module_order}

    for m in module_order:
        for n in own_defs[m]:
            defined_by[n] = m  # later module wins, like the monolith

    shared = own_defs["_registry"]

    for i, m in enumerate(module_order):
        if m == "_registry":
            out = bodies[m]
        else:
            earlier = module_order[:i]
            need: dict[str, list[str]] = {}
            for n in sorted(used_names(trees[m]) - own_defs[m]):
                if n in ("DataFrame", "SparkSession", "Window", "F",
                         "ROW_KEY", "ColumnarTable", "RowIdPolicy",
                         "Callable", "Dict", "annotations"):
                    continue
                src_mod = None
                for e in reversed(earlier):
                    if n in own_defs[e]:
                        src_mod = e
                        break
                if src_mod is not None:
                    need.setdefault(src_mod, []).append(n)
            imports = []
            for e in earlier:
                if e in need:
                    names = ", ".join(sorted(need[e]))
                    imports.append(
                        f"from knime_core_columnar_spark.catalog.{e} import (  # noqa: F401\n    "
                        + ",\n    ".join(sorted(need[e]))
                        + ",\n)\n"
                    )
            out = (
                f'"""{DOC[m]}\n\nSplit from the monolithic catalog.py (round 6); registration\norder is preserved by the package __init__ import sequence.\n"""\n'
                + HEADER_IMPORTS
                + "\n"
                + "".join(imports)
                + "\n"
                + bodies[m]
            )
        with open(os.path.join(DST, f"{m}.py"), "w") as f:
            f.write(out)
        print(f"wrote {m}.py ({out.count(chr(10))} lines)")

    init = '''"""Query catalog package (split from the 9.5k-line catalog.py, round 6).

THE IMPORT SEQUENCE BELOW IS THE REGISTRATION-ORDER CONTRACT: section
modules register queries into the shared _registry.QUERIES/_registry.
ORACLES dicts as they import, and the layout modules reorder those dicts
IN PLACE, so `queries()` sees exactly the order the old monolith
produced. Every top-level name of every section is copied into this
package namespace (tests and tools address `catalog.<anything>`), and
the reload loop makes `importlib.reload(catalog)` rebuild everything
from scratch, matching the old single-module reload semantics.
"""

from __future__ import annotations

import importlib
import sys

_SECTIONS = [
'''
    for m in module_order:
        init += f'    "{m}",\n'
    init += '''\
]

_pkg = sys.modules[__name__]
for _name in _SECTIONS:
    _full = f"{__name__}.{_name}"
    if _full in sys.modules:
        _mod = importlib.reload(sys.modules[_full])
    else:
        _mod = importlib.import_module(_full)
    for _k, _v in vars(_mod).items():
        if not _k.startswith("__"):
            setattr(_pkg, _k, _v)
del _pkg, _name, _full, _mod, _k, _v
'''
    with open(os.path.join(DST, "__init__.py"), "w") as f:
        f.write(init)
    print("wrote __init__.py")
    os.remove(SRC)
    print(f"removed {SRC}")


if __name__ == "__main__":
    main()
