"""Local self-oracle: mirror of the driver's DuckDB comparison.

Runs each registered query on Spark AND its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column set + order-insensitive
canonicalized values (the driver hashes; we diff so failures are debuggable).

Usage:
    python -m spark_ml_helper_spark.check [--sf DIR] [name ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

from spark_ml_helper_spark.registry import REGISTRY, load_all_operators
from spark_ml_helper_spark.session import get_spark
from spark_ml_helper_spark.sources.parquet import TABLES


def _canon_cell(v) -> str:
    """Canonical string for one cell, tolerant of numpy/pandas scalar types."""
    import datetime

    import numpy as np

    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        if f == 0.0:
            f = 0.0  # normalize -0.0
        return repr(f)
    if isinstance(v, (np.bool_, bool)):
        return "T" if bool(v) else "F"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    # pandas Timestamp / NaT / Decimal etc.
    tn = type(v).__name__
    if tn == "NaTType":
        return "NULL"
    if tn == "Timestamp":
        return v.isoformat()
    if tn == "Decimal":
        # Scale-preserving on purpose: the driver hashes Decimal('0.017070')
        # differently from the float 0.01707, so collapsing to float here
        # would hide exactly the mismatch class the driver flags. A Spark
        # DECIMAL column vs a DuckDB DOUBLE oracle must fail locally too —
        # fix the query by CASTing its output AS DOUBLE in the shared SQL.
        return str(v)
    try:
        if v != v:  # NaN-ish
            return "NaN"
    except Exception:
        pass
    return str(v)


def canon_rows(pdf) -> list[tuple[str, ...]]:
    """Sorted canonical row tuples, columns ordered by name (mirrors the
    driver's sort-columns-then-hash comparison)."""
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def check_one(spark, con, name: str, sf_dir: str, verbose: bool = True):
    spec = REGISTRY[name]
    t0 = time.time()
    sdf = spec.fn(spark, sf_dir)
    spdf = sdf.toPandas()
    t_spark = time.time() - t0
    if spec.oracle is None:
        return ("ROWS-ONLY", f"{len(spdf)} rows in {t_spark:.2f}s")
    t0 = time.time()
    opdf = con.execute(spec.oracle).fetchdf()
    t_duck = time.time() - t0

    def _canon_dtype(dt: str) -> str:
        # Arrow hands Spark timestamps back as ns and DuckDB's as us — the
        # values are identical micros either way, so unify the unit. All
        # other dtypes must match exactly (int width divergence between the
        # engines is a real query bug: align casts in the query + oracle).
        return "datetime64" if dt.startswith("datetime64") else dt

    issues = []
    scols, ocols = sorted(spdf.columns), sorted(opdf.columns)
    if scols != ocols:
        issues.append(f"columns differ: spark={scols} oracle={ocols}")
    else:
        for c in scols:
            sd, od = _canon_dtype(str(spdf[c].dtype)), _canon_dtype(str(opdf[c].dtype))
            # 'object' covers strings/arrays on both sides — compare only
            # when both engines produced a concrete numeric/temporal dtype
            if sd != od and "object" not in (sd, od):
                issues.append(f"dtype differs on {c}: spark={sd} oracle={od}")
    if not issues and len(spdf) != len(opdf):
        issues.append(f"row count differs: spark={len(spdf)} oracle={len(opdf)}")
    if not issues:
        srows, orows = canon_rows(spdf), canon_rows(opdf)
        if srows != orows:
            n_bad = sum(1 for a, b in zip(srows, orows) if a != b)
            for a, b in zip(srows, orows):
                if a != b:
                    issues.append(f"value diff ({n_bad}/{len(srows)} rows)\n  spark : {a}\n  oracle: {b}")
                    break
    if issues:
        return ("FAIL", "; ".join(issues))
    return ("PASS", f"{len(spdf)} rows | spark {t_spark:.2f}s duck {t_duck:.2f}s")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names = []
    it = iter(argv)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a in ("-h", "--help"):
            print(
                "usage: python -m spark_ml_helper_spark.check "
                "[--sf SF_DIR] [name ...]\n"
                "Runs each registry query AND its DuckDB oracle on the "
                "same parquet tables\n(default: all queries at "
                "/root/testdata/sf0.01) and compares row count,\n"
                "schema, and order-insensitive value hash — the driver's "
                "correctness gate."
            )
            return 0
        else:
            names.append(a)
    load_all_operators()
    names = names or list(REGISTRY)
    spark = get_spark()
    con = duckdb_connect(sf_dir)
    n_pass = n_fail = 0
    for name in names:
        if name not in REGISTRY:
            print(f"{name:24s} UNKNOWN")
            n_fail += 1
            continue
        try:
            status, detail = check_one(spark, con, name, sf_dir)
        except Exception:
            status, detail = "ERROR", traceback.format_exc(limit=5).replace("\n", "\n    ")
        ok = status in ("PASS", "ROWS-ONLY")
        n_pass += ok
        n_fail += not ok
        print(f"{name:24s} {status:9s} {detail}")
    print(f"\n{n_pass} ok, {n_fail} failed (sf={sf_dir})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
