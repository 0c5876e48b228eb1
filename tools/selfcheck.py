#!/usr/bin/env python3
"""Self-check: compare Verify output parquet against DuckDB oracle results.

Mimics the driver's t2 gate: per query — row count, schema (column names),
and exact value hash after sorting columns by name and rows by value.
Usage: selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)


def frame_key(con, sql):
    rel = con.sql(sql)
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return sorted(c for c in cols), len(rows), hash(tuple(map(tuple, data))), data


def hugeint_cols(con, sql):
    """Columns whose DuckDB type the driver's pandas bridge mangles.

    The driver canonicalizes oracle results through pandas, which renders
    HUGEINT/UHUGEINT (e.g. a window sum over BIGINT) as float64 while the
    Spark parquet holds int64 — a guaranteed hash mismatch that fetchall()
    (native Python ints) does NOT reproduce. Flag them here so the local
    gate is at least as strict as the driver's.
    """
    desc = con.sql(f"DESCRIBE ({sql})").fetchall()
    return [(name, typ) for name, typ, *_ in desc
            if "HUGEINT" in typ.upper()]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            bad = hugeint_cols(con, sql)
            if bad:
                print(f"FAIL {name}: oracle columns {bad} are HUGEINT — "
                      f"the driver's pandas bridge renders these as float64; "
                      f"CAST them (e.g. AS BIGINT) in the oracle SQL")
                failed.append(name)
                continue
            ocols, on, ohash, odata = frame_key(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        try:
            scols, sn, shash, sdata = frame_key(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failed.append(name)
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            failed.append(name)
        elif on != sn:
            print(f"FAIL {name}: rows oracle={on} spark={sn}")
            failed.append(name)
        elif ohash != shash:
            diff = [(a, b) for a, b in zip(odata, sdata) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs (oracle, spark): {diff}")
            failed.append(name)
        else:
            print(f"OK   {name} ({sn} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
