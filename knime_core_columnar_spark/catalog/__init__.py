"""Query catalog package (split from the 9.5k-line catalog.py, round 6).

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
    "_registry",
    "core",
    "llm_text",
    "tpch_more",
    "widening_a",
    "widening_b",
    "partsupp",
    "formats_graph",
    "staged_r5",
    "staged_r6",
    "staged_r7",
    "staged_r8",
    "staged_r9",
    "round6_ext",
    "round7_ext",
    "round8_ext",
    "round9_ext",
    "round10_ext",
    "round11_ext",
    # LAST: orders the registry (never-checked first, then greens
    # oldest-evidence-first) so the driver's 50-slot window is always
    # the freshness frontier — see rotation.py
    "rotation",
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
