#!/usr/bin/env python3
"""Determinism audit: value-identity of two graft.Verify dumps.

Usage: python3 tools/detcmp.py <dirA> <dirB>

Each query dir's parquet is read fully, sorted by every column, and
compared cell-for-cell (NaN==NaN). Exit 0 iff every query matches.
"""
import sys, os, glob
import duckdb


def main(a, b):
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
    bad = []
    for n in names:
        da, db = os.path.join(a, n), os.path.join(b, n)
        if not os.path.isdir(db):
            bad.append(f"{n}: missing in {b}")
            continue
        fa, fb = glob.glob(f"{da}/*.parquet"), glob.glob(f"{db}/*.parquet")
        if not fa or not fb:
            bad.append(f"{n}: empty dump ({len(fa)} vs {len(fb)} files)")
            continue
        ra = con.sql(f"SELECT * FROM read_parquet('{da}/*.parquet')")
        rb = con.sql(f"SELECT * FROM read_parquet('{db}/*.parquet')")
        xa, xb = ra.fetchdf(), rb.fetchdf()
        if sorted(xa.columns) != sorted(xb.columns):
            bad.append(f"{n}: schema {sorted(xa.columns)} vs {sorted(xb.columns)}")
            continue
        ta = dict(zip(ra.columns, (str(t) for t in ra.types)))
        tb = dict(zip(rb.columns, (str(t) for t in rb.types)))
        tdiff = [c for c in sorted(xa.columns) if ta[c] != tb[c]]
        if tdiff:
            bad.append(f"{n}: types differ on {[(c, ta[c], tb[c]) for c in tdiff[:4]]}")
            continue
        cols = sorted(xa.columns)
        xa = xa[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        xb = xb[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        if len(xa) != len(xb):
            bad.append(f"{n}: rows {len(xa)} vs {len(xb)}")
            continue
        for c in cols:
            ga, gb = xa[c], xb[c]
            eq = (ga.isna() & gb.isna()) | (ga == gb)
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append(f"{n}: {c}[row{i}] {ga[i]!r} vs {gb[i]!r}")
                break
    print(f"{len(names) - len(bad)}/{len(names)} value-identical")
    for m in bad:
        print("DIFF " + m)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
