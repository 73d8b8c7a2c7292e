#!/usr/bin/env python3
"""Dev-only replica of the driver's t2 correctness gate.

Runs DuckDB on each oracle_sql.json entry over the fixture parquet
tables, loads the Spark result parquet written by graft.Verify, and
compares: row count, column names (sorted), and values (rows sorted,
exact). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


#: The driver's comparator factorizes cells with pandas, which CRASHES
#: on array/map/struct values — this replica must be at least as
#: strict, or nested outputs ship invisibly (r17: g_sgns_train).
SCALAR_TYPES = (type(None), bool, int, float, str, bytes)


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    if not isinstance(v, SCALAR_TYPES):
        # lists, dicts, numpy arrays, decimals-as-objects, dates are
        # fine to *stringify*, but the driver's gate can't hash them —
        # fail loudly instead of masking the violation
        import datetime
        import decimal
        if not isinstance(v, (datetime.date, datetime.datetime,
                              datetime.time, decimal.Decimal)):
            raise TypeError(
                f"non-scalar cell {type(v).__name__}: {v!r} — the driver's "
                "gate rejects nested outputs; flatten at the registration "
                "site (concat_ws / posexplode, the a3_team_groups rule)")
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        try:
            files = glob.glob(os.path.join(spark_dir, "*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output at {spark_dir}")
                n_fail += 1
                continue
            srel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols, srows = norm_rows(srel.columns, srel.fetchall())
            orel = con.sql(sql)
            ocols, orows = norm_rows(orel.columns, orel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
        elif srows != orows:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"FAIL {name}: {len(diff)} differing rows; first: spark={diff[0][0]} oracle={diff[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
