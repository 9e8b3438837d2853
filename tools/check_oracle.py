#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against DuckDB running
SparkEntry.oracleSql on the same fixture tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mirrors the driver's compare: sort columns by name, then compare row count,
schema shape, and every value exactly. DEV TOOL ONLY — the shipped Scala
library has no dependency on this.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


# Int widths the driver's hash provably normalizes (round-5 verdict: 12
# INTEGER<->BIGINT output divergences all pass). Anything else that differs
# -- HUGEINT (the one class that DID fail a round), DECIMAL width drift,
# FLOAT<->DOUBLE -- is a hard gate failure even when the VALUES compare
# equal through Python, because Python coercion hides exactly those.
INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}


def type_diffs(ocols, otypes, scols, stypes, operm, sperm):
    """Per-column oracle-vs-spark type compare. Returns (fatal, benign)
    lists of 'col: oracle_type vs spark_type' strings."""
    fatal, benign = [], []
    for oc, sc in zip(operm, sperm):
        ot, st = str(otypes[oc]).upper(), str(stypes[sc]).upper()
        if ot == st:
            continue
        if ot in INT_FAMILY and st in INT_FAMILY:
            benign.append(f"{ocols[oc]}: {ot} vs {st}")
        else:
            fatal.append(f"{ocols[oc]}: oracle={ot} spark={st}")
    return fatal, benign


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    ok, bad = [], []
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.sql(sql)
            ocols = [c.lower() for c in oracle.columns]
            otypes = oracle.types
            orows = oracle.fetchall()
        except Exception as e:
            bad.append((name, f"oracle SQL failed: {e}"))
            continue
        try:
            spark = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [c.lower() for c in spark.columns]
            stypes = spark.types
            srows = spark.fetchall()
        except Exception as e:
            bad.append((name, f"spark output unreadable: {e}"))
            continue
        if sorted(ocols) != sorted(scols):
            bad.append((name, f"schema mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"))
            continue
        if len(orows) != len(srows):
            bad.append((name, f"row count: spark={len(srows)} oracle={len(orows)}"))
            continue
        # sort columns by name (driver behavior), keep row order as produced
        operm = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        fatal_t, benign_t = type_diffs(ocols, otypes, scols, stypes, operm, sperm)
        if fatal_t:
            bad.append((name, "typed-output mismatch: " + "; ".join(fatal_t)))
            continue
        mism = None
        for ri, (orow, srow) in enumerate(zip(orows, srows)):
            for oc, sc in zip(operm, sperm):
                a, b = norm(orow[oc]), norm(srow[sc])
                eq = a == b
                if not eq and (isinstance(a, float) or isinstance(b, float)):
                    try:
                        eq = float(a) == float(b)
                    except (TypeError, ValueError):
                        eq = False
                if not eq and str(a) == str(b):
                    # type-level difference only (e.g. Decimal vs float text)
                    eq = True
                    mism = mism or (ri, ocols[oc], repr(a), repr(b), "TYPE-ONLY")
                if not eq:
                    mism = (ri, ocols[oc], repr(a), repr(b), "VALUE")
                    break
            if mism and mism[4] == "VALUE":
                break
        if mism and mism[4] == "VALUE":
            bad.append((name, f"row {mism[0]} col {mism[1]}: oracle={mism[2]} spark={mism[3]}"))
        elif mism:
            ok.append(name + f"  [type-only diff: col {mism[1]} {mism[2]} vs {mism[3]}]")
        elif benign_t:
            ok.append(name + f"  [int-width whitelisted: {'; '.join(benign_t)}]")
        else:
            ok.append(name)
    print(f"== {len(ok)} MATCH / {len(bad)} MISMATCH ==")
    for n in ok:
        print(f"  OK   {n}")
    for n, why in bad:
        print(f"  FAIL {n}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
