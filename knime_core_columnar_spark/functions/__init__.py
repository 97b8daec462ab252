"""Scalar function library (SURVEY.md §2.7).

The reference has no scalar-function library — in KNIME, expression
evaluation lives in consumer nodes (e.g. the benchmark workflow's
"String Manipulation" node, whose settings.xml the backend merely
executes against). This package supplies that capability surface as a
curated, documented catalog of Catalyst expressions: everything is
JVM-side (whole-stage codegen, pushdown-friendly), nothing is a Python
UDF. Import the registry or the helper functions directly.
"""

from knime_core_columnar_spark.functions.library import (
    FUNCTION_REGISTRY,
    apply_function,
    list_functions,
)

__all__ = ["FUNCTION_REGISTRY", "apply_function", "list_functions"]
