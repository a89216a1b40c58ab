#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [queryName...]

Extra args restrict the comparison to the named queries (for local
iteration against a filtered graft.Verify dump).

Reads each query's Spark result (parquet written by graft.Verify) and its
oracle SQL (oracle_sql.json), runs the oracle in DuckDB over views named after
the testdata tables, and compares: column names (sorted), **Arrow column
types**, row count, and values (rows sorted by all columns).

The typed comparison is the load-bearing part: the driver hashes *typed*
results, so an oracle whose windowed/plain SUM comes back as DuckDB HUGEINT
(int128) against Spark's BIGINT must fail HERE, not only at the driver
(round-3 lesson: window_session_gap passed a value-lenient local check and
failed the driver's hash gate on exactly this). Pandas `.df()` erases that
distinction; Arrow keeps it.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def type_token(arrow_type):
    """Collapse an Arrow type to the token the driver's hash discipline
    cares about: integer width, float width, decimal, string, etc."""
    s = str(arrow_type)
    # Spark writes int64; DuckDB HUGEINT surfaces as decimal128(38,0) or
    # float64 depending on version — any of those vs int64 is a real drift.
    if s.startswith("timestamp"):
        return "timestamp"
    if s in ("string", "large_string", "utf8", "large_utf8"):
        return "string"
    if s in ("binary", "large_binary"):
        return "binary"
    if s.startswith("list") or s.startswith("large_list"):
        return "list"
    return s


def rows_of(tbl):
    cols = sorted(tbl.column_names)
    tbl = tbl.select(cols)
    types = [type_token(tbl.schema.field(c).type) for c in cols]
    recs = []
    pydict = tbl.to_pydict()
    n = tbl.num_rows
    series = [pydict[c] for c in cols]
    for i in range(n):
        recs.append(tuple(s[i] for s in series))
    recs.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, types, recs


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if type(a) is not type(b) and not (
            isinstance(a, (int, float)) and isinstance(b, (int, float))):
        return str(a) == str(b)
    return a == b


def near(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return eq(a, b)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():  # Spark-written table (e.g. a ScaleGen sf dir)
            p = f"{p}/*.parquet"
        if Path(p).exists() or p.endswith("*.parquet"):
            sel = f"SELECT * FROM read_parquet('{p}')"
            if t == "events":
                # mirror the Spark catalog's adaptive ts rebuild: a
                # ScaleGen-written dir stores ts as raw int64 NANOS
                (ty,) = [r[1] for r in con.sql(f"DESCRIBE {sel}").fetchall()
                         if r[0] == "ts"]
                if ty == "BIGINT":
                    sel = (f"SELECT * REPLACE (make_timestamp(ts // 1000) "
                           f"AS ts) FROM read_parquet('{p}')")
            con.execute(f"CREATE VIEW {t} AS {sel}")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    only = set(sys.argv[3:])
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_path = out_dir / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").arrow()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gc, gt, gr = rows_of(got)
        wc, wt, wr = rows_of(want)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}")
            n_fail += 1
            continue
        if gt != wt:
            drift = [f"{c}: spark={a} oracle={b}"
                     for c, a, b in zip(gc, gt, wt) if a != b]
            print(f"FAIL {name}: TYPE drift — " + "; ".join(drift) +
                  "  (cast the oracle column, e.g. CAST(... AS BIGINT))")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            n_fail += 1
            continue
        bad = None
        near_only = 0
        for i, (a, b) in enumerate(zip(gr, wr)):
            if all(eq(x, y) for x, y in zip(a, b)):
                continue
            if all(near(x, y) for x, y in zip(a, b)):
                near_only += 1
                continue
            bad = (i, a, b)
            break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i}\n  spark : {a}\n  oracle: {b}")
            n_fail += 1
        elif near_only:
            print(f"NEAR {name}: {near_only} rows differ only within 1e-9 (float)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows, cols={gc})")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracle)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
