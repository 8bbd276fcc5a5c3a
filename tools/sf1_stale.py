#!/usr/bin/env python3
"""Flag query keys whose implementation may have changed since the last sf1
certification (the round-14 lesson: five keys changed AFTER the cert ran and
the stale rows shipped unflagged).

Reads `git_commit` from CORRECTNESS_SF1.json (written by the cert run), diffs
src/main against HEAD, and maps changed files to the query keys they define
(a key is attributed to the file containing its `"q_..."` registration
literal). File granularity is deliberately coarse: a changed shared helper in
an operator file flags every key in that file — over-flagging is the safe
direction for a staleness check.

Exit 0 with no output when the cert is current; exit 1 listing stale keys
otherwise (gate.sh treats that as advisory, not fatal — re-certify or
acknowledge in BASELINE.md).
"""
import json
import os
import re
import subprocess
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cert_path = os.path.join(repo, "CORRECTNESS_SF1.json")
if not os.path.exists(cert_path):
    print("sf1_stale: no CORRECTNESS_SF1.json — no cert to be stale against")
    sys.exit(0)
cert = json.load(open(cert_path))
commit = cert.get("git_commit")
if not commit:
    print("sf1_stale: CORRECTNESS_SF1.json has no git_commit field — "
          "cannot tell what code it certified (regenerate it on HEAD)")
    sys.exit(1)

changed = subprocess.run(
    ["git", "diff", "--name-only", commit, "HEAD", "--", "src/main"],
    cwd=repo, capture_output=True, text=True)
if changed.returncode != 0:
    print(f"sf1_stale: git diff failed: {changed.stderr.strip()}")
    sys.exit(1)
files = [f for f in changed.stdout.split() if f.endswith(".scala")]
# uncommitted work counts as changed too
dirty = subprocess.run(["git", "diff", "--name-only", "HEAD", "--", "src/main"],
                       cwd=repo, capture_output=True, text=True)
files += [f for f in dirty.stdout.split() if f.endswith(".scala")]
if not files:
    sys.exit(0)

key_re = re.compile(r'"(q_[a-z0-9_]+)"')
stale = set()
certified = set(cert.get("queries", {}))
for f in sorted(set(files)):
    p = os.path.join(repo, f)
    if not os.path.exists(p):
        continue
    for key in key_re.findall(open(p).read()):
        if key in certified:
            stale.add(key)
if stale:
    print(f"sf1_stale: {len(stale)} certified keys live in files changed "
          f"since cert commit {commit[:9]}:")
    print("  " + " ".join(sorted(stale)))
    sys.exit(1)
sys.exit(0)
