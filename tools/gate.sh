#!/usr/bin/env bash
# END-OF-ROUND GATE — run before any snapshot/commit that touches query
# registrations or shared SQL text (the round-12 lesson: three queries
# shipped with Spark-unparsable shared SQL because the snapshot landed
# without this check).
#
#   tools/gate.sh            # fast: every query CONSTRUCTS AND RUNS at
#                            # sf0.001 + registry/oracle key parity
#   tools/gate.sh full       # + full DuckDB hash-compare at sf0.01
#
# Exit nonzero on any failure.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch "testOnly graft.ContractSpec" 2>&1 | tail -5 | grep -q "All tests passed." \
  || { echo "GATE FAIL: ContractSpec"; exit 1; }
echo "GATE OK: ContractSpec (all queries run at sf0.001; registry<->oracle<->SURVEY parity)"

# Flag certified keys whose implementation changed since the last sf1 cert
# (key-granular since round 16). Advisory in fast mode; FATAL in `full`
# (end-of-round snapshot) mode — rounds 14 AND 15 both shipped a stale cert,
# so the snapshot path no longer gets to warn-and-proceed.
if [[ "${1:-}" == "full" ]]; then
  python3 tools/sf1_stale.py \
    || { echo "GATE FAIL: sf1 certification is stale for the keys above — re-run tools/cert_sf1.py on HEAD"; exit 1; }
else
  python3 tools/sf1_stale.py || echo "GATE WARN: sf1 certification is stale for the keys above"
fi

if [[ "${1:-}" == "full" ]]; then
  rm -rf /tmp/gate_vout
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_vout" >/dev/null 2>&1
  python3 tools/check.py /root/testdata/sf0.01 /tmp/gate_vout | tail -1
  python3 tools/check.py /root/testdata/sf0.01 /tmp/gate_vout | tail -1 | grep -q "ALL GREEN" \
    || { echo "GATE FAIL: correctness"; exit 1; }
fi
