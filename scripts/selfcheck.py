#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB running oracle_sql.json over the same test tables.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import os
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


def main(sf_dir: str, out_dir: str, skip: set = frozenset()) -> int:
    con = duckdb.connect()
    if os.environ.get("SELFCHECK_THREADS"):
        con.execute(f"SET threads TO {os.environ['SELFCHECK_THREADS']}")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written table = dir of part files
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    # ScaleUp tiers round-trip events.ts through Spark as nanos-as-long,
    # which drops the TIMESTAMP_NANOS logical type (Spark can't write ns).
    # Restore the original type so oracle SQL binds identically to the
    # driver-generated tiers.
    ts_type = con.execute(
        "SELECT column_type FROM (DESCRIBE events) WHERE column_name='ts'"
    ).fetchone()
    if ts_type and ts_type[0] == "BIGINT":
        con.execute("CREATE OR REPLACE VIEW events AS "
                    "SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                    f"FROM '{sf_dir}/events.parquet/*.parquet'")
        print("NOTE  events.ts BIGINT ns -> make_timestamp(us) (ScaleUp "
              "tier; same div-1000 path as the Spark reader)")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if skip:
        print(f"SKIPPING {len(skip)} queries by flag: {sorted(skip)}")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            continue
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
            # Exact-first; when only float columns differ, report whether
            # the drift is accumulation-order ulp noise (rel err < 1e-9 —
            # expected for double sums at ScaleUp tiers where the engines
            # add the same values in different orders) vs a real mismatch.
            ulp_only = False
            if not ok_vals and ok_shape and ok_cols and ok_dtypes:
                import numpy as np
                is_f = {c: str(got[c].dtype).startswith("float")
                        for c in got.columns}
                keys = [c for c in got.columns if not is_f[c]]
                if keys:  # canon sorted on float strings too; redo on keys
                    g = got.sort_values(keys, ignore_index=True,
                                        key=lambda s: s.astype(str))
                    w = want.sort_values(keys, ignore_index=True,
                                         key=lambda s: s.astype(str))
                else:
                    g, w = got, want
                ulp_only = True
                for c in g.columns:
                    if is_f[c]:
                        if not np.allclose(g[c], w[c], rtol=1e-9,
                                           atol=1e-12, equal_nan=True):
                            ulp_only = False
                    elif not g[c].astype(str).equals(w[c].astype(str)):
                        ulp_only = False
            if ok_vals and ok_dtypes:
                n_pass += 1
                print(f"PASS  {name}  rows={len(got)}")
            elif ulp_only:
                n_pass += 1
                print(f"PASS* {name}  rows={len(got)}  "
                      "(float ulp only, rel err < 1e-9)")
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
    skip_names: set = set()
    argv = [a for a in sys.argv[1:] if not a.startswith("--skip=")]
    for a in sys.argv[1:]:
        if a.startswith("--skip="):
            skip_names |= set(a[len("--skip="):].split(","))
    sys.exit(main(argv[0], argv[1], skip_names))
