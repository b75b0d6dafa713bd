#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math, os, hashlib
import duckdb


def digest(rows, idx):
    """Canonical result digest, mirroring graft.Canon (Verify.scala):
    cells (columns sorted by name, via idx) joined with U+001F, row
    strings sorted, joined with U+001E, md5. Lets a driver-only hash
    mismatch be triaged by comparing digests.json (what Verify wrote)
    against this recomputation and the oracle-side digest."""
    strs = sorted("\x1f".join(norm(r[i]) for i in idx) for r in rows)
    return hashlib.md5("\x1e".join(strs).encode("utf-8")).hexdigest()

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list): return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file tables; Spark/lake-written
        # tables (e.g. the sf1 rehearsal twin) are directories of parts
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # Verify-side failures (errors.json, round 10+): a query that THREW has
    # no parquet and - for capture-oracle queries - no oracle entry either,
    # so without this it would vanish from the report entirely.
    errs_path = os.path.join(out_dir, "errors.json")
    errs = json.load(open(errs_path)) if os.path.exists(errs_path) else {}
    dig_path = os.path.join(out_dir, "digests.json")
    vdig = json.load(open(dig_path)) if os.path.exists(dig_path) else {}
    for name in sorted(set(errs) - set(oracle)):
        print(f"FAIL {name}: verify error: {errs[name][:200]}"); n_fail += 1
    for name in sorted(oracle):
        sql = oracle[name]
        pq = os.path.join(out_dir, name)
        files = glob.glob(pq + "/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchall()
            gcols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            wcols = [d[0] for d in con.description]
            # Type-sensitive: the driver hashes typed values, so a DuckDB
            # HUGEINT (e.g. bare integer sum) vs Spark BIGINT mismatches even
            # when the string forms agree. DESCRIBE both sides and compare.
            gtypes = dict((r[0], r[1]) for r in con.execute(
                f"DESCRIBE SELECT * FROM '{pq}/*.parquet'").fetchall())
            wtypes = dict((r[0], r[1]) for r in con.execute(
                f"DESCRIBE ({sql})").fetchall())
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:200]}"); n_fail += 1; continue
        # driver sorts columns by name before hashing values
        gi = sorted(range(len(gcols)), key=lambda i: gcols[i])
        wi = sorted(range(len(wcols)), key=lambda i: wcols[i])
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: cols {sorted(gcols)} vs {sorted(wcols)}"); n_fail += 1; continue
        badtypes = [(c, gtypes.get(c), wtypes.get(c)) for c in sorted(gcols)
                    if gtypes.get(c) != wtypes.get(c)]
        if badtypes:
            print(f"FAIL {name}: type mismatch " +
                  ", ".join(f"{c}: spark={a} oracle={b}" for c, a, b in badtypes))
            n_fail += 1; continue
        g = sorted(tuple(norm(r[i]) for i in gi) for r in got)
        w = sorted(tuple(norm(r[i]) for i in wi) for r in want)
        # informational digest triangulation: Verify's Scala-side digest
        # of the dump vs this python recomputation of the same parquet.
        # A disagreement here (with values equal) means the two readers
        # render some type differently — exactly the class of driver-only
        # mismatch the digest exists to expose.
        gdig = digest(got, gi)
        if name in vdig and vdig[name].get("md5") != gdig:
            print(f"NOTE {name}: Verify digest {vdig[name]['md5']} != "
                  f"check.py re-read {gdig} (type-rendering delta)")
        if g == w:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"
                  f" spark-digest={gdig} oracle-digest={digest(want, wi)}")
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
            for a, b in diffs:
                print(f"   spark:  {a}\n   oracle: {b}")
            if len(g) != len(w):
                sg, sw = set(g), set(w)
                for x in list(sg - sw)[:2]: print(f"   only-spark:  {x}")
                for x in list(sw - sg)[:2]: print(f"   only-oracle: {x}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
