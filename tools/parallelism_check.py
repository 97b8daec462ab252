#!/usr/bin/env python3
"""Parallelism-invariance gate: every catalog query must produce the
IDENTICAL canonical result multiset under a stress Spark configuration —
many small scan splits, a prime shuffle-partition count, exchange reuse
disabled — as under the repo's defaults.

This is the determinism claim the oracle gate cannot test (tools/check.py
runs one configuration): operators whose results secretly depend on
partition boundaries, partition count, task scheduling, or Catalyst
exchange reuse (window ties without total orders, first/last without
frames, prefix sums whose two passes desynchronize, hash-sample seeds
derived from partition ids) all break HERE, at 8-row partitions and 97
shuffle partitions, before they break at 100 TB where partitioning is
never the same twice.

Usage: python tools/parallelism_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check import frame_to_multiset  # noqa: E402  (shared canon)

STRESS = {
    "spark.sql.shuffle.partitions": "97",
    "spark.sql.files.maxPartitionBytes": "262144",  # 256 KiB -> many splits
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.exchange.reuse": "false",
    "spark.sql.adaptive.enabled": "false",  # no runtime re-coalescing either
}


def run_all(spark, sf_dir: str, only: set[str]) -> dict[str, list[str]]:
    from knime_core_columnar_spark import catalog

    out = {}
    for name, fn in catalog.QUERIES.items():
        if only and name not in only:
            continue
        try:
            out[name] = frame_to_multiset(fn(spark, sf_dir).toPandas())
        except Exception as e:
            out[name] = [f"ERROR: {type(e).__name__}: {e}"]
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from knime_core_columnar_spark.session import get_spark

    spark = get_spark(app_name="parallelism-check", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    baseline = run_all(spark, sf_dir, only)
    defaults = {k: spark.conf.get(k, None) for k in STRESS}

    for k, v in STRESS.items():
        spark.conf.set(k, v)
    try:
        stressed = run_all(spark, sf_dir, only)
    finally:
        for k, v in defaults.items():
            if v is not None:
                spark.conf.set(k, v)

    failures = []
    for name, base in baseline.items():
        got = stressed.get(name, ["MISSING"])
        if base == got:
            print(f"ok   {name} ({len(base)} rows)")
        else:
            failures.append(name)
            detail = ""
            if len(base) != len(got):
                detail = f" rows {len(base)} vs {len(got)}"
            else:
                diff = sum(1 for a, b in zip(base, got) if a != b)
                detail = f" {diff} differing rows"
                for a, b in zip(base, got):
                    if a != b:
                        detail += f"\n       base: {a[:160]}\n     stress: {b[:160]}"
                        break
            print(f"FAIL {name}{detail}")

    print(f"\n{len(baseline) - len(failures)}/{len(baseline)} "
          "parallelism-invariant")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
