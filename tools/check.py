#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (SURVEY.md §6).

Runs each oracle SQL from verify-out/oracle_sql.json in DuckDB against the
raw test tables and compares with the Spark parquet dumps written by
graft.Verify. Compares schema (column names sorted), row count, and values
(exact for ints/strings, bitwise for doubles since both engines follow the
decimal-sum convention).

READ PATHS (the r15 rework — the blind spot that cost rounds 12-14): the
SPARK dump is read via pyarrow→pandas, NOT through DuckDB. Reading both
sides through DuckDB made the compare pass by construction for any type
DuckDB coerces identically from parquet and from its own result set —
which is exactly how three gates shipped raw DECIMAL(38,0) output columns
driver-red for three rounds while this replica said all-green: DuckDB
coerces DECIMAL→float64 on BOTH sides (28834.0 == 28834.0), while the
driver reads the Spark parquet on a pyarrow path where decimal128 becomes
python Decimal objects (Decimal('28834') != 28834.0 under the value hash
⇒ rows+schema green, hash red — the observed signature). With pyarrow on
the Spark side, a decimal output column now lands as dtype kind 'O'
against the oracle's 'f' and fails the type gate HERE, pre-commit.
The companion lint is OutputTypeLintSpec (gate outputs must stay within
int/bigint/double/string/boolean/date/timestamp).

Usage: python3 tools/check.py <sfdir> <verify_out_dir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.dataset as pads

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def warn_poisoned_ledger():
    """Loud warning when the working-tree BENCH_LOCAL.json total exceeds the
    committed one by >10% — the r12/r13 round-close failure mode where a
    contention-inflated one-shot overwrote the quiet min-merged record.
    WARN, not refuse: correctness results must never be held hostage to a
    bench file (the driver runs this gate at round close and a refusal
    would turn a ledger hygiene issue into 353 red queries). graft.Bench
    now min-merges the canonical file on write, so this firing at all
    means someone bypassed it."""
    try:
        import subprocess
        here = os.path.dirname(os.path.abspath(__file__)) + "/.."
        cur = json.load(open(os.path.join(here, "BENCH_LOCAL.json")))
        prev = json.loads(subprocess.run(
            ["git", "show", "HEAD:BENCH_LOCAL.json"],
            capture_output=True, text=True, check=True, cwd=here).stdout)
        if cur["value"] > 1.1 * prev["value"]:
            print(f"[bench-ledger] WARNING: working-tree BENCH_LOCAL.json total "
                  f"{cur['value']:.1f}s exceeds committed {prev['value']:.1f}s by >10% — "
                  f"POISONED ledger; min-merge before committing (tools/bench_tripwire.py)")
    except Exception:
        pass


def main(sfdir, outdir):
    warn_poisoned_ledger()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "EMPTY-DIR"
            continue
        # driver-faithful Spark-side read: pyarrow, not DuckDB (see header).
        # date_as_object=False keeps date32 on the datetime64 kind 'M' that
        # the DuckDB oracle frame also lands on; decimals deliberately stay
        # object-dtype Decimal so the type gate below can catch them.
        gtbl = pads.dataset(files, format="parquet").to_table()
        got = gtbl.to_pandas(date_as_object=False)
        if name not in oracle:
            results[name] = f"rows-only: {len(got)} rows" + (" OK" if len(got) > 0 else " FAIL(0 rows)")
            continue
        try:
            erel = con.sql(oracle[name])
            exp = erel.fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {str(e)[:200]}"
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            results[name] = f"SCHEMA-MISMATCH spark={gcols} oracle={ecols}"
            continue
        # Driver-faithful type gate (the class that cost round 11, widened
        # in r15): the driver hashes pandas-coerced values, so what matters
        # is the pandas dtype KIND on each side's OWN read path. Spark side
        # (pyarrow): int32/int64 -> 'i', double -> 'f', decimal128 -> 'O'
        # (python Decimal — the r12-r14 red class, now caught here). Oracle
        # side (DuckDB fetchdf): BIGINT/INTEGER -> 'i', DECIMAL/DOUBLE and
        # HUGEINT -> 'f' (so oracles must CAST widening aggregates back to
        # BIGINT to stay in the int kind). Comparing kinds across the two
        # paths reproduces the driver's pass/fail set.
        gtypes = dict(zip(gtbl.schema.names, (str(t) for t in gtbl.schema.types)))
        etypes = dict(zip(erel.columns, (str(t) for t in erel.types)))
        tbad = [f"{c}: spark={got[c].dtype}({gtypes[c]}) oracle={exp[c].dtype}({etypes[c]})"
                for c in gcols if got[c].dtype.kind != exp[c].dtype.kind]
        if tbad:
            results[name] = "TYPE-MISMATCH " + "; ".join(tbad[:4])
            continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(got)} oracle={len(exp)}"
            continue
        got, exp = got[gcols].reset_index(drop=True), exp[ecols].reset_index(drop=True)
        bad = []
        for c in gcols:
            gv, ev = got[c], exp[c]
            try:
                eq = (gv.isna() & ev.isna()) | (gv == ev)
                if not eq.all():
                    i = int((~eq).idxmax())
                    bad.append(f"{c}[row{i}]: spark={gv[i]!r} oracle={ev[i]!r}")
            except Exception as e:
                bad.append(f"{c}: compare-error {str(e)[:100]}")
        results[name] = "OK" if not bad else "VALUE-MISMATCH " + "; ".join(bad[:3])
    n_ok = sum(1 for v in results.values() if v.startswith("OK") or v.endswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') or v.endswith('OK') else 'FAIL'}  {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    missing = set(oracle) - set(results)
    if missing:
        print(f"oracle keys with no spark output: {sorted(missing)}")
        return 1
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
