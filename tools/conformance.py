"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir,
compare row count, schema (column names) and order-insensitive values.

Usage: python tools/conformance.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    # Data-derived oracles (PCA components) must come from THIS dir.
    os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir
    sqls = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: engine raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok?  {name}: rows-only ({len(got)} rows)")
            continue
        want = canon(con.execute(sqls[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures += 1
            continue
        mismatch_cols = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
                ok = bool(eq.all())
            except Exception:
                ok = a.astype(str).equals(b.astype(str))
            if not ok:
                mismatch_cols.append(c)
        if mismatch_cols:
            print(f"FAIL {name}: value mismatch in {mismatch_cols}")
            for c in mismatch_cols[:2]:
                neq = got[c].astype(str) != want[c].astype(str)
                print("  engine:", got.loc[neq].head(3).to_dict("records"))
                print("  oracle:", want.loc[neq].head(3).to_dict("records"))
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
