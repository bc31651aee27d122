#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the parquet tables in
<sfDir> (registered under their bare table names), loads the Spark result
parquet from <verifyOutDir>/<name>/, sorts columns by name, and compares
row counts + multiset of rows (exact values).
"""
import json, sys, glob, math
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def rows_multiset(df):
    cols = sorted(df.columns)
    df = df[cols]
    return sorted(tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)), cols

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                # subset runs (Verify's dev-only 3rd arg) leave most
                # queries without output — skip BEFORE running the oracle
                # SQL (some oracles are expensive in DuckDB)
                if len(sys.argv) > 3 and sys.argv[3] == "--subset":
                    continue
                print(f"FAIL {name}: no spark output parquet")
                fail += 1
                continue
            want = con.sql(sql).df()
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            wr, wc = rows_multiset(want)
            gr, gc = rows_multiset(got)
            if wc != gc:
                print(f"FAIL {name}: columns differ  oracle={wc}  spark={gc}")
                fail += 1
            elif len(wr) != len(gr):
                print(f"FAIL {name}: rowcount differ  oracle={len(wr)}  spark={len(gr)}")
                fail += 1
            elif wr != gr:
                diff = [ (a,b) for a,b in zip(wr,gr) if a != b ][:3]
                print(f"FAIL {name}: values differ (rows={len(wr)}), first diffs: {diff}")
                fail += 1
            else:
                print(f"OK   {name} ({len(wr)} rows)")
                ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            fail += 1
    print(f"== {ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
