#!/usr/bin/env python
"""Capture .explain('formatted') for every declared query into plans/<tag>/.

Usage: python tools_capture_plans.py <tag> [suffix] [gate ...]
  tag: subdir under plans/ (e.g. r09)
  suffix: 'before' or 'after' (default 'before')
  gate...: subset of gate names (default: all)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r09"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    from dbreg_spark.sources.io import get_session

    import __spark_entry__ as em

    spark = get_session(
        "capture_plans", master="local[4]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    qs = em.queries()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            txt = f"EXPLAIN FAILED: {e!r}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print(f"done: {len(qs) if not only else len(only)} plans -> {outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
