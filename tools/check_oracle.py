#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet
tables and diff values (columns sorted by name, rows sorted, exact value
equality with int/float normalization)."""
import json
import math
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "__int__") and not isinstance(v, (int, float)):  # Decimal etc.
        f = float(v)
        return int(v) if f.is_integer() else f
    return v


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    oracle = json.loads((OUT_DIR / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        out = OUT_DIR / name
        if not out.exists():
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        # Driver-hash parity: DuckDB promotes sum(BIGINT) to HUGEINT,
        # which the driver's arrow/pandas bridge re-encodes (float64 /
        # object) so the value hash diverges from Spark's int64 even
        # when every value is numerically equal (r11 cost 4 gate rows:
        # event_transition_matrix & co). Spark never emits HUGEINT, so
        # any HUGEINT oracle column is an un-CAST sum() — fail loud.
        type_bad = False
        try:
            wtypes = dict(zip(con.sql(sql).columns,
                              (str(t) for t in con.sql(sql).types)))
            gtypes = dict(zip(
                con.sql(f"SELECT * FROM read_parquet('{out}/*.parquet')").columns,
                (str(t) for t in con.sql(
                    f"SELECT * FROM read_parquet('{out}/*.parquet')").types)))
            for c, t in wtypes.items():
                if t in ("HUGEINT", "UHUGEINT"):
                    print(f"FAIL {name}: oracle column '{c}' is {t} "
                          f"(spark side {gtypes.get(c)}) — CAST it in the SQL")
                    type_bad = True
                elif t.startswith("DECIMAL") and not str(
                        gtypes.get(c, "")).startswith("DECIMAL"):
                    print(f"FAIL {name}: oracle column '{c}' is {t} but "
                          f"spark side is {gtypes.get(c)} — align the types")
                    type_bad = True
        except Exception as e:  # type introspection must never mask a diff
            print(f"WARN {name}: type introspection failed: {e}")
        if type_bad:
            n_fail += 1
            continue
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        wperm = [want_cols.index(c) for c in sorted(want_cols)]
        # None-safe total order that still compares int/float NUMERICALLY
        # (a type-name key would order Decimal-normalized ints differently
        # from the float parquet side and false-FAIL equal result sets)
        def vkey(v):
            if v is None:
                return (2, 0, "")
            if isinstance(v, (int, float)):
                return (0, v, "")
            return (1, 0, str(v))
        key = lambda t: tuple(vkey(v) for v in t)
        g = sorted((tuple(norm(r[i]) for i in gperm) for r in got), key=key)
        w = sorted((tuple(norm(r[i]) for i in wperm) for r in want), key=key)
        if g == w:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            else:
                diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
                print(f"FAIL {name}: value diffs (spark vs duckdb): {diffs}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
