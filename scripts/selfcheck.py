#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB running oracle_sql.json over the same test tables.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
            want = canon(con.execute(sql).fetchdf())
            ok_shape = got.shape == want.shape
            ok_cols = list(got.columns) == list(want.columns)
            ok_dtypes = all(str(a) == str(b) for a, b
                            in zip(got.dtypes, want.dtypes))
            # value compare as strings (what a hash would see)
            ok_vals = ok_shape and ok_cols and \
                got.astype(str).equals(want.astype(str))
            if ok_vals and ok_dtypes:
                n_pass += 1
                print(f"PASS  {name}  rows={len(got)}")
            else:
                n_fail += 1
                print(f"FAIL  {name}  shape={ok_shape} cols={ok_cols} "
                      f"dtypes={ok_dtypes} vals={ok_vals}")
                if not ok_cols:
                    print(f"      got  cols {list(got.columns)}")
                    print(f"      want cols {list(want.columns)}")
                elif not ok_dtypes:
                    print(f"      got  dtypes {list(map(str, got.dtypes))}")
                    print(f"      want dtypes {list(map(str, want.dtypes))}")
                elif ok_shape:
                    neq = ~(got.astype(str) == want.astype(str)).all(axis=1)
                    print("      first diffs (got vs want):")
                    print(got[neq].head(3).to_string())
                    print(want[neq].head(3).to_string())
                else:
                    print(f"      got {got.shape} want {want.shape}")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
