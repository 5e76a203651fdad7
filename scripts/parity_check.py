#!/usr/bin/env python
"""Driver-gate rehearsal: run every queries() entry against its oracle_sql()
via DuckDB (row count + sorted-value equality), mirroring the driver's
correctness gate.  Usage: python scripts/parity_check.py [sf_dir]
"""
import os
import sys

import duckdb
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

if not ray.is_initialized():
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             log_to_driver=False)

import __ray_entry__ as E  # noqa: E402

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

qs, osql = E.queries(), E.oracle_sql()
results, failed = [], 0
for name, fn in qs.items():
    a = b = None
    cols = []
    try:
        res = fn(sf)
        df_r = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if name not in osql:
            results.append(f"{name} ROWSONLY {len(df_r)} rows")
            continue
        df_o = con.sql(osql[name]).df()
        cols = sorted(df_o.columns)
        a = df_r[cols].sort_values(cols).reset_index(drop=True)
        b = df_o[cols].sort_values(cols).reset_index(drop=True)
        if len(a) != len(b):
            results.append(f"{name} FAIL rowcount ray={len(a)} oracle={len(b)}")
            failed += 1
            continue
        # Dtype-strict: the driver's hash gate is sensitive to the pandas
        # dtype rendering (int64 vs float64 vs nullable Int64), so a
        # check_dtype=False pass here does NOT predict a driver-green row
        # (this is exactly how round 4 shipped three red rows).
        dt_bad = [c for c in cols if str(a[c].dtype) != str(b[c].dtype)]
        if dt_bad:
            failed += 1
            results.append(
                f"{name} FAIL dtype "
                + ", ".join(f"{c}: ray={a[c].dtype} oracle={b[c].dtype}"
                            for c in dt_bad))
            continue
        pd.testing.assert_frame_equal(a, b, check_dtype=True)
        results.append(f"{name} OK {len(a)}")
    except AssertionError as e:
        failed += 1
        results.append(f"{name} FAIL values {str(e)[:150]}")
        for c in cols:
            try:
                if not a[c].equals(b[c]):
                    neq = a[c].ne(b[c])
                    results.append(f"  col {c} "
                                   + str(list(zip(a[c][neq][:3], b[c][neq][:3]))))
            except Exception:
                pass
    except Exception as e:
        failed += 1
        results.append(f"{name} ERROR {str(e)[:200]}")
ray.shutdown()
print("\n".join(results))
print(f"{len(qs) - failed}/{len(qs)} queries pass")
sys.exit(1 if failed else 0)
