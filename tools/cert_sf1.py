#!/usr/bin/env python3
"""Regenerate CORRECTNESS_SF1.json from a Verify dump at sf1.

Usage: python3 tools/cert_sf1.py <sfDir> <verifyOutDir>

Runs tools/check.py over the dump, parses its per-query lines, and writes
CORRECTNESS_SF1.json INCLUDING the git commit of HEAD at cert time — the
field tools/sf1_stale.py needs to detect post-cert impl drift.
"""
import datetime
import json
import os
import re
import subprocess
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sf_dir, out_dir = sys.argv[1], sys.argv[2]
run = subprocess.run([sys.executable, os.path.join(repo, "tools/check.py"),
                      sf_dir, out_dir], capture_output=True, text=True)
sys.stderr.write(run.stderr)
queries = {}
for line in run.stdout.splitlines():
    m = re.match(r"^(OK|FAIL)\s+([a-z0-9_]+):\s*(.*)$", line)
    if not m:
        continue
    status, name, detail = m.groups()
    q = {"status": "pass" if status == "OK" else "fail"}
    rm = re.match(r"^(\d+) rows$", detail)
    if rm:
        q["rows"] = int(rm.group(1))
    elif status == "FAIL":
        q["detail"] = detail[:300]
    queries[name] = q
n_pass = sum(1 for q in queries.values() if q["status"] == "pass")
n_fail = len(queries) - n_pass
# A crashed check.py or a parse producing zero queries must NOT write a
# fresh-looking empty cert (it would mute sf1_stale.py's staleness signal).
if run.returncode not in (0, 1) or not queries:
    sys.stderr.write(
        f"cert_sf1: check.py rc={run.returncode}, parsed {len(queries)} "
        "queries — refusing to write a cert\n")
    sys.exit(2)
head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=repo,
                      capture_output=True, text=True).stdout.strip()
doc = {
    "sf": "sf1 (testdata-sf1: 6M lineitem / 1M events / 50k docs)",
    "date": datetime.date.today().isoformat(),
    "git_commit": head,
    "protocol": ("graft.Verify dump at testdata-sf1 -> tools/check.py "
                 "(DuckDB re-executes every oracle SQL, compares "
                 "columns+rows+typed values)"),
    "n_queries": len(queries),
    "n_pass": n_pass,
    "n_fail": n_fail,
    "result": run.stdout.splitlines()[-1] if run.stdout else "no output",
    "queries": queries,
}
with open(os.path.join(repo, "CORRECTNESS_SF1.json"), "w") as f:
    json.dump(doc, f, indent=1)
print(f"cert_sf1: {n_pass}/{len(queries)} pass at {head[:9]} -> CORRECTNESS_SF1.json")
sys.exit(1 if n_fail else 0)
