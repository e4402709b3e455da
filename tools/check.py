#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
shipped library is pure Scala). Usage:

    python3 tools/check.py /tmp/verify_out [sfdir]

Reads each <name>/ parquet result dumped by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfdir
tables, and compares: schema (column names), row count, and an
order-insensitive hash of the values with columns sorted by name.

IMPORTANT (round-1 lesson): the Spark result is read with pyarrow, NOT
through DuckDB. Reading both sides through DuckDB shares DuckDB's value
rendering and masks representation mismatches (e.g. decimal scale) that
the real driver gate catches — round 1 passed 70/70 locally while the
driver failed 15. Two independent readers stringifying cells is the
faithful replica.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return repr(v)
    # Spark parquet timestamps are UTC-adjusted (pyarrow yields tz-aware
    # datetimes); DuckDB yields naive ones. Timestamp-output queries pass
    # the real driver gate, so normalize to naive-UTC like the driver.
    import datetime
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return str(v.astimezone(datetime.timezone.utc).replace(tzinfo=None))
    return str(v)


def read_spark_result(files):
    """Read graft.Verify output with pyarrow, preserving Spark's own
    output representation (decimals stay python Decimal at the file's
    declared scale, timestamps stay datetime, binary stays bytes)."""
    cols, rows = None, []
    for f in sorted(files):
        t = pq.read_table(f)
        if cols is None:
            cols = t.column_names
        for r in t.to_pylist():
            rows.append(tuple(r[c] for c in cols))
    return rows, cols


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (ScaleGen sf1 tier)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main():
    # optional: --timeout-sec N caps each ORACLE's DuckDB run (a
    # watchdog thread calls con.interrupt()); an oracle that exceeds
    # the cap prints a TIMEOUT row (the documented per-query
    # oracle-cost exclusion the big tiers need) and the run continues
    # on a fresh connection. The SPARK side always ran to completion —
    # only the DuckDB ground-truth recomputation is being bounded.
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    timeout = None
    for a in sys.argv[1:]:
        if a.startswith("--timeout-sec="):
            timeout = float(a.split("=", 1)[1])
    out_dir = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    con = connect(sf_dir)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    n_pass = n_fail = n_noora = n_timeout = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no result parquet")
            n_fail += 1
            continue
        got, got_cols = read_spark_result(files)
        if name not in oracles:
            print(f"NOORACLE {name}: rows={len(got)} cols={got_cols}")
            n_noora += 1
            continue
        timer = None
        timed_out = [False]
        if timeout:
            import threading
            c = con
            def interrupt(c=c):
                timed_out[0] = True
                c.interrupt()
            timer = threading.Timer(timeout, interrupt)
            timer.start()
        try:
            exp = con.execute(oracles[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            if timer:
                timer.cancel()
            if timed_out[0]:
                print(f"TIMEOUT {name}: oracle exceeded {timeout:.0f}s in DuckDB "
                      f"(excluded; Spark result present, rows={len(got)})")
                n_timeout += 1
                con = connect(sf_dir)  # fresh connection after interrupt
                continue
            print(f"FAIL  {name}: oracle error {e}")
            n_fail += 1
            continue
        finally:
            if timer:
                timer.cancel()
        ok_schema = sorted(got_cols) == sorted(exp_cols)
        ok_rows = len(got) == len(exp)
        ok_hash = ok_schema and ok_rows and \
            table_hash(got, got_cols) == table_hash(exp, exp_cols)
        if ok_hash:
            print(f"PASS  {name}: rows={len(got)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL  {name}: schema_ok={ok_schema} rows {len(got)} vs {len(exp)}")
            if not ok_schema:
                print(f"      got  {sorted(got_cols)}\n      want {sorted(exp_cols)}")
            elif ok_rows:
                # show first differing row pair for debugging
                order_g = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
                order_e = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
                gs = sorted("\x01".join(norm_cell(r[i]) for i in order_g) for r in got)
                es = sorted("\x01".join(norm_cell(r[i]) for i in order_e) for r in exp)
                for a, b in zip(gs, es):
                    if a != b:
                        print(f"      got  {a[:200]}\n      want {b[:200]}")
                        break
    tmo = f", {n_timeout} oracle-timeout" if n_timeout else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} no-oracle{tmo}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
