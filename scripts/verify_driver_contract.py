"""Drive the repo exactly as the grading driver does: run entry(),
then each requested queries() entry at sf0.01 side-by-side with its
oracle_sql() through DuckDB, comparing row count, sorted-column schema,
and a value hash.  Usage:

    python scripts/verify_driver_contract.py [query ...]   # default: all
"""

import hashlib
import os
import sys

os.environ.setdefault("PYARROW_IGNORE_TIMEZONE", "1")

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_rows(cols, rows):
    cols = list(cols)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return sorted(cols), hashlib.sha256("\x1e".join(out).encode()).hexdigest()[:16], len(out)


def main():
    want = sys.argv[1:]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("== entry() smoke ==")
    edf = entrymod.entry(spark)
    print("entry rows:", edf.count(), "schema:", edf.schema.simpleString()[:120])

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = want or list(qs)
    fails = 0
    for name in names:
        df = qs[name](spark, SF_DIR)
        srows = df.collect()
        scols, shash, sn = norm_rows(df.columns, [tuple(r) for r in srows])
        if name not in oracles:
            print(f"{name:28s} rows={sn} (rows-only, no oracle)")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ocols, ohash, on = norm_rows(ocols, orows)
        ok = (sn == on) and (scols == ocols) and (shash == ohash)
        print(f"{name:28s} rows={sn}/{on} schema={'OK' if scols==ocols else 'MISMATCH'} hash={'OK' if shash==ohash else 'MISMATCH'} -> {'PASS' if ok else 'FAIL'}")
        if not ok:
            fails += 1
            if scols != ocols:
                print("   spark cols:", scols, "\n   oracle cols:", ocols)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
