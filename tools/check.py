#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle
SQL from oracle_sql.json in DuckDB over the sf-dir parquet tables and
compares against the Spark parquet dumped by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, int):
        return float(v) if False else v
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)

def connect(sf_dir, out_dir):
    con = duckdb.connect()
    # Bound DuckDB's memory so a big-SF window/join spills to disk
    # instead of riding the default 80%-of-RAM limit into the OOM
    # killer (observed at sf3: one query's spike killed the whole
    # sweep). GRAFT_CHECK_MEM overrides.
    con.sql(f"SET memory_limit='{os.environ.get('GRAFT_CHECK_MEM', '24GB')}'")
    con.sql(f"SET temp_directory='{out_dir}/.duckdb_tmp'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (GenTestData sf1 corpus): a directory
            # of part files rather than the driver's single file
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

# errors that poison the CONNECTION (allocator/spill state), not just
# the query: observed in the sf10 sweep, where one oracle's failed
# 77 GB spill cascaded "bad allocation" into every later query on the
# same connection. Reconnect + retry once before recording a FAIL.
POISON = ("Out of Memory", "No space left", "IO Error",
          "bad allocation")

def reconnect(old, sf_dir, out_dir):
    """Tear down `old` and build a fresh instance, persistently: a
    dying 48 GB buffer pool can take seconds to actually release, and
    the replacement's first allocations fail until it does (observed
    twice in the sf10 sweep)."""
    import gc, time
    try:
        old.close()
    except Exception:
        pass
    del old
    last = None
    for i in range(5):
        gc.collect()
        time.sleep(3 + 5 * i)
        try:
            return connect(sf_dir, out_dir)
        except Exception as e:
            last = e
    raise last

def main(sf_dir, out_dir, only=None):
    con = connect(sf_dir, out_dir)
    since_rotate = 0
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {n: s for n, s in oracle.items() if any(
            n.startswith(p) for p in only)}
        if not oracle:
            # a typo'd prefix must not read as a green sweep: 0 pass /
            # 0 fail exiting 0 looks like success while checking nothing
            print(f"FAIL: filter {only} matched no oracle queries")
            return 2
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        # long sweeps accumulate buffer-pool state across hundreds of
        # heavy oracles until a query that runs fine on a FRESH
        # instance (text_search_e2e: 8 s / <40 GB standalone) dies with
        # "bad allocation" — rotate the connection periodically
        since_rotate += 1
        if since_rotate >= 50:
            con = reconnect(con, sf_dir, out_dir)
            since_rotate = 0
        # two separate steps with distinct FAIL labels (r16 ADVICE: a
        # corrupt Spark parquet used to be mislabeled 'oracle error',
        # and a poison error during the cheap result read re-executed
        # the expensive oracle SQL on retry). Oracle rows are fetched
        # into Python lists, so a reconnect between the steps is safe
        # and the retry re-runs only the step that failed.
        err, stage, o_done = None, "oracle", False
        for attempt in (0, 1):
            try:
                if not o_done:
                    stage = "oracle"
                    o = con.sql(sql)
                    ocols, orows = [c.lower() for c in o.columns], o.fetchall()
                    otypes = [str(t).upper() for t in o.types]
                    o_done = True
                stage = "spark result"
                s = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
                scols, srows = [c.lower() for c in s.columns], s.fetchall()
                stypes = [str(t).upper() for t in s.types]
                err = None
                break
            except Exception as e:
                err = e
                if any(p in str(e) for p in POISON):
                    # a poisoned instance must not outlive this query
                    # either way: retry once on a fresh connection, and
                    # if that also fails, still hand the NEXT query a
                    # clean instance instead of the dead one
                    if attempt == 0:
                        print(f"RETRY {name}: reconnecting after {stage} error: {e}",
                              flush=True)
                    con = reconnect(con, sf_dir, out_dir)
                    since_rotate = 0
                    if attempt == 1:
                        break
                else:
                    break
        if err is not None:
            print(f"FAIL {name}: {stage} error {err}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        # Type-faithfulness gate: the driver's hasher hashes the TYPED
        # representation, so a DuckDB-widened oracle type (windowed
        # sum -> HUGEINT, avg/decimal math -> DECIMAL) fails there even
        # when fetchall() values coerce equal here. Compare per-column
        # type names and fail on any mismatch.
        omap = dict(zip(ocols, otypes))
        smap = dict(zip(scols, stypes))
        tdiff = [(c, omap[c], smap[c]) for c in sorted(omap)
                 if omap[c] != smap[c]]
        if tdiff:
            print(f"FAIL {name}: type mismatch "
                  + "; ".join(f"{c}: oracle={ot} spark={st}" for c, ot, st in tdiff))
            n_fail += 1
            continue
        co, cs = canon(orows, ocols), canon(srows, scols)
        if co == cs:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
            for i, (a, b) in enumerate(zip(co, cs)):
                if a != b:
                    print(f"  first diff at {i}:\n    oracle={a}\n    spark ={b}")
                    break
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    # optional 3rd arg: comma-separated name prefixes (same convention
    # as graft.Verify's filter) — local iteration / sweep resume
    only = sys.argv[3].split(',') if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
