"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin at sf0.01,
compare row count, schema (column names sorted), and a value hash.

Usage: python check_gates.py [gate ...]   (default: all gates)
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _none_safe_key(row):
    return tuple((v is None, str(type(v)), v if v is not None else 0) for v in row)


def value_hash(rows) -> str:
    # driver-style: sort columns by name, sort rows, hash rounded reprs
    # (None-safe sort: None < any value, mixed types never compared raw)
    h = hashlib.sha256()
    for row in sorted(rows, key=_none_safe_key):
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def norm(v):
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def main() -> int:
    # data-dependent oracles (text_bpe_encode's embedded word map) must
    # train on the same sf dir the gate reads
    os.environ["SPARK_GRAFT_GATE_SF_DIR"] = SF_DIR

    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("check_gates")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = e.queries()
    oracles = e.oracle_sql()
    keys = sys.argv[1:] or sorted(qs)
    bad = []
    for k in keys:
        try:
            sdf = qs[k](spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = [
                tuple(norm(r[c]) for c in scols) for r in sdf.collect()
            ]
            if k not in oracles:
                # driver records a weaker rows-only check for non-SQL ops
                print(f"PASS {k}: rows {len(srows)} (rows-only, no oracle)")
                continue
            odf = con.execute(oracles[k]).fetch_arrow_table()
            ocols = sorted(odf.column_names)
            opy = odf.to_pylist()
            orows = [tuple(norm(r[c]) for c in ocols) for r in opy]
            rm = len(srows) == len(orows)
            sm = scols == ocols
            hm = value_hash(srows) == value_hash(orows)
            ok = rm and sm and hm
            print(
                f"{'PASS' if ok else 'FAIL'} {k}: rows {len(srows)}/"
                f"{len(orows)} schema={sm} hash={hm}"
            )
            if not ok:
                bad.append(k)
                if not sm:
                    print(f"  spark cols:  {scols}\n  oracle cols: {ocols}")
                elif rm and len(srows) <= 10:
                    for a, b in zip(sorted(srows, key=_none_safe_key), sorted(orows, key=_none_safe_key)):
                        if a != b:
                            print(f"  spark:  {a}\n  oracle: {b}")
        except Exception as exc:  # noqa: BLE001
            bad.append(k)
            print(f"ERR  {k}: {type(exc).__name__}: {exc}")
    print(f"\n{len(keys) - len(bad)}/{len(keys)} green; failing: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
