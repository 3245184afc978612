"""Local replica of the driver's oracle check — dtype-faithful.

Runs every ``queries()`` entry at a given SF and compares against
``oracle_sql()`` via DuckDB, canonicalizing the way the driver does:
sort columns by name, sort rows by all columns, then hash the VALUES
including their rendered dtype (so a DuckDB HUGEINT→float64 vs a Spark
BIGINT→int64 mismatches here exactly like it does in
CORRECTNESS_r{N}.json, which ``check_dtype=False`` comparisons miss).

Usage:  python tools/verify_oracle.py [sf_dir] [only_prefix...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    # Normalize same-kind width differences the driver tolerates
    # (int32 vs int64, datetime[ns] vs [us]) but keep KIND differences
    # (int64 vs float64 — the DuckDB HUGEINT trap) visible.
    for c in cols:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "f":
            df[c] = df[c].astype("float64")
        elif k == "M":
            df[c] = df[c].astype("datetime64[ns]")
    if len(df):
        df = df.sort_values(cols).reset_index(drop=True)
    return df


def _value_hash(df: pd.DataFrame) -> str:
    # Full-precision values PLUS the column dtypes: an int64 57 and a
    # float64 57.0 must hash differently, exactly like the driver's
    # canonical frame hash treats them.
    head = ",".join(str(dt) for dt in df.dtypes)
    body = df.to_csv(index=False, float_format="%.17g")
    return hashlib.md5((head + "\n" + body).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    from activity_classifier_spark_cassandra_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark(shuffle_partitions=16, master="local[16]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    results: dict[str, dict] = {}
    n_bad = 0
    for name, fn in qs.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        t0 = time.time()
        try:
            sdf = _canon(fn(spark, sf_dir).toPandas())
            if name not in oracles:
                # rows-only: still exercise the canonicalizer (this is
                # what crashed q_approx_sketch in round 2)
                _value_hash(sdf)
                results[name] = {"mode": "rows_only", "rows": len(sdf)}
                print(f"{name}: rows-only {len(sdf)} "
                      f"[{time.time()-t0:.1f}s]")
                continue
            odf = _canon(con.execute(oracles[name]).df())
            ok_rows = len(sdf) == len(odf)
            ok_schema = list(sdf.columns) == list(odf.columns)
            ok_dtype = ok_schema and all(
                str(a) == str(b) for a, b in zip(sdf.dtypes, odf.dtypes)
            )
            ok_hash = ok_schema and _value_hash(sdf) == _value_hash(odf)
            ok = ok_rows and ok_schema and ok_hash
            results[name] = {
                "rows_match": ok_rows, "schema_match": ok_schema,
                "dtype_match": ok_dtype, "hash_match": ok_hash,
                "spark_rows": len(sdf), "oracle_rows": len(odf),
            }
            if not ok:
                n_bad += 1
                print(f"{name}: *** MISMATCH *** rows={ok_rows} "
                      f"schema={ok_schema} dtype={ok_dtype} "
                      f"hash={ok_hash} [{time.time()-t0:.1f}s]")
                if ok_schema:
                    print(f"  spark dtypes:  {dict(sdf.dtypes.astype(str))}")
                    print(f"  oracle dtypes: {dict(odf.dtypes.astype(str))}")
                    if len(sdf) == len(odf):
                        neq = (sdf.astype(str) != odf.astype(str)).any(axis=0)
                        print(f"  differing cols: {list(neq[neq].index)}")
                else:
                    print(f"  spark cols:  {list(sdf.columns)}")
                    print(f"  oracle cols: {list(odf.columns)}")
            else:
                tag = "" if ok_dtype else " (dtype-diff, hash ok)"
                print(f"{name}: OK rows={len(sdf)}{tag} "
                      f"[{time.time()-t0:.1f}s]")
        except Exception as exc:  # noqa: BLE001 — report and continue
            n_bad += 1
            results[name] = {"err": str(exc)[:500]}
            print(f"{name}: *** ERROR *** {str(exc)[:300]}")
    spark.stop()
    with open("/tmp/verify_oracle.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"\n{len(results)} checked, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
