#!/usr/bin/env bash
# The full end-of-round gate, one command (see .claude/skills/verify/SKILL.md):
#   compile -> ScalaTest -> Verify+DuckDB oracle at sf0.01 AND sf0.001
#   -> partition-invariance probe (CPUS=1 vs 4, row-exact) -> Bench sf0.1.
# Exits nonzero on the first failure. ~8 min on this machine.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile + test =="
sbt -batch compile
sbt -batch test

for sf in sf0.01 sf0.001; do
  echo "== verify + oracle @$sf =="
  out="/tmp/gate_$sf"
  rm -rf "$out"   # stale dirs from dropped/renamed queries must not linger
  sbt -batch "runMain graft.Verify /root/testdata/$sf $out"
  python3 tools/check_oracle.py "/root/testdata/$sf" "$out"
done

echo "== partition invariance (CPUS=1 vs 4, sf0.01) =="
rm -rf /tmp/gate_p1
SPARK_GRAFT_CPUS=1 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_p1"
python3 - <<'EOF'
import duckdb, os
con = duckdb.connect()
# GK percentile summaries are partition-structure-dependent WITHIN their
# rank tolerance: CPUS=1 vs 4 may legally return different (equally
# valid) order statistics, so bit-comparing this op is not a correctness
# signal (PropertySuite bounds it against exact order statistics instead)
SKETCH_TOLERANT = {"agg_approx_percentile"}
names = sorted(d for d in os.listdir('/tmp/gate_sf0.01')
               if os.path.isdir(f'/tmp/gate_sf0.01/{d}')
               and d not in SKETCH_TOLERANT)
for n in names:
    a = con.execute(f"SELECT * FROM read_parquet('/tmp/gate_sf0.01/{n}/*.parquet')").fetchall()
    b = con.execute(f"SELECT * FROM read_parquet('/tmp/gate_p1/{n}/*.parquet')").fetchall()
    assert a == b, f"{n} differs between CPUS=4 and CPUS=1"
print(f"{len(names)} queries partition-invariant")
EOF

echo "== bench sf0.1 =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep -F '"metric"'

echo "GATE GREEN"
