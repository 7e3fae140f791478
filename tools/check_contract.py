"""Local stand-in for the driver's correctness gate: runs every
``queries()`` entry against its ``oracle_sql()`` via DuckDB at a given
scale factor, comparing row count, column names, and an order-insensitive
value hash. Usage: python tools/check_contract.py [sf_dir] [query ...]"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v) -> str:
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(rows)} rows, {time.time()-t0:.1f}s)")
            if len(rows) == 0:
                print(f"WARN {name}: zero rows in rows-only query")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        # The driver canonicalizes the oracle side through pandas, which
        # renders HUGEINT/UHUGEINT as float64 ("5.0" vs Spark's "5") — a
        # hash mismatch fetchall() can't see. Catch it at the type level.
        try:
            desc = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
            bad = [(c, t) for c, t, *_ in desc if t in ("HUGEINT", "UHUGEINT")]
            if bad:
                problems.append(
                    f"oracle emits {bad} — pandas renders these as float64; "
                    "cast to ::BIGINT"
                )
        except Exception:  # noqa: BLE001
            pass  # DESCRIBE unsupported for this statement shape; skip
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols {sorted(cols)} != {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if not problems:
            hs, ho = value_hash(cols, rows), value_hash(ocols, orows)
            if hs != ho:
                problems.append(f"valuehash {hs} != {ho}")
                order_s = sorted(range(len(cols)), key=lambda i: cols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                cs = sorted("|".join(_norm_cell(r[i]) for i in order_s) for r in rows)
                co = sorted("|".join(_norm_cell(r[i]) for i in order_o) for r in orows)
                diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
                for a, b in diffs:
                    print(f"  spark : {a[:160]}")
                    print(f"  duckdb: {b[:160]}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS {name} ({len(rows)} rows, {time.time()-t0:.1f}s)")
    print("---")
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
