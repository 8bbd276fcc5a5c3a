#!/usr/bin/env python3
"""Flag query keys whose implementation may have changed since the last sf1
certification (the round-14 lesson: five keys changed AFTER the cert ran and
the stale rows shipped unflagged).

KEY-GRANULAR (round 16 — the round-15 file-granular version flagged 41 keys
for a 12-line change to two files, which is how a signal becomes ignored):

1. Every src/main scala file is split into top-level entities (indent-0
   object/class) and their indent-2 members; each owns its line interval.
2. Changed lines come from `git diff -U0 <cert_commit> HEAD` hunk headers
   (new-file ranges), plus the dirty working tree.
3. A member overlapping a changed range is stale. Its `"q_..."` literals are
   stale keys; a keyless member is a shared helper, and staleness propagates
   to referencers, to fixpoint. To keep short names (k, n, load, apply) from
   flagging the world, cross-file propagation only follows QUALIFIED
   `Owner.member` references, import-checked entity names, and `graft_*`
   function-name literals found in the changed lines (the SQL-string linkage
   to native expressions); bare-name matches count within the same file only.
4. Unparseable diffs fall back to whole-file keys — over-flagging stays the
   safe direction for genuine parse failures.

Exit 0 with no output when the cert is current; exit 1 listing stale keys
otherwise (gate.sh: advisory in fast mode, FATAL in `full` end-of-round mode).
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

certified = set(cert.get("queries", {}))
KEY_RE = re.compile(r'"(q_[a-z0-9_]+)"')
GRAFT_RE = re.compile(r'"(graft_[a-z0-9_]+)')
MODS = r"(?:private\s+|protected\s+|lazy\s+|final\s+|implicit\s+|override\s+|abstract\s+|sealed\s+)*"
MEMBER_RE = re.compile(r"^  " + MODS + r"(?:val|def|var|object|class|case\s+class|trait)\s+([A-Za-z_][A-Za-z0-9_]*)")
ENTITY_RE = re.compile(r"^" + MODS + r"(?:object|class|case\s+class|trait)\s+([A-Za-z_][A-Za-z0-9_]*)")


def run(args):
    return subprocess.run(args, cwd=repo, capture_output=True, text=True)


class Member:
    def __init__(self, file, owner, name, start, end, body, is_entity):
        self.file, self.owner, self.name = file, owner, name
        self.start, self.end, self.body = start, end, body
        self.is_entity = is_entity


def parse_file(path):
    try:
        lines = open(os.path.join(repo, path)).read().splitlines()
    except OSError:
        return [], ""
    ents = [(i, m.group(1)) for i, ln in enumerate(lines, 1)
            if (m := ENTITY_RE.match(ln))]
    mems = [(i, m.group(1)) for i, ln in enumerate(lines, 1)
            if (m := MEMBER_RE.match(ln))]
    out = []
    for idx, (start, name) in enumerate(ents):
        end = ents[idx + 1][0] - 1 if idx + 1 < len(ents) else len(lines)
        out.append(Member(path, None, name, start, end,
                          "\n".join(lines[start - 1:end]), True))
    for idx, (start, name) in enumerate(mems):
        end = mems[idx + 1][0] - 1 if idx + 1 < len(mems) else len(lines)
        # clamp to the enclosing entity so the last member of one object
        # doesn't swallow the next object's header
        owner = None
        for e in out:
            if e.start <= start <= e.end:
                owner, end = e.name, min(end, e.end)
        out.append(Member(path, owner, name, start, end,
                          "\n".join(lines[start - 1:end]), False))
    return out, "\n".join(lines)


def changed_ranges(diff_args):
    """{file: [(new_start, new_end)]}; a file mapping to None = whole file."""
    out = run(["git", "diff", "-U0"] + diff_args + ["--", "src/main"])
    if out.returncode != 0:
        return None
    ranges, cur = {}, None
    for ln in out.stdout.splitlines():
        if ln.startswith("+++ "):
            cur = ln[4:].strip()
            cur = None if cur == "/dev/null" else cur[2:] if cur.startswith("b/") else cur
            if cur is not None and cur.endswith(".scala"):
                ranges.setdefault(cur, [])
            else:
                cur = None
        elif ln.startswith("@@") and cur is not None:
            m = re.match(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", ln)
            if not m:
                ranges[cur] = None
                continue
            start = int(m.group(1))
            n = int(m.group(2)) if m.group(2) is not None else 1
            # a pure deletion (n=0) still touches the surrounding member
            ranges[cur].append((max(start, 1), start + max(n, 1) - 1))
    return ranges


ranges = changed_ranges([commit, "HEAD"])
dirty = changed_ranges(["HEAD"])
if ranges is None or dirty is None:
    print(f"sf1_stale: git diff against {commit[:9]} failed")
    sys.exit(1)
for f, r in dirty.items():
    if r is None:
        ranges[f] = None
    elif ranges.get(f) is not None:
        ranges.setdefault(f, []).extend(r)
if not ranges:
    sys.exit(0)

all_files = run(["git", "ls-files", "src/main"]).stdout.split()
files = {}
full_text = {}
for f in set(all_files) | set(ranges):
    if f.endswith(".scala") and os.path.exists(os.path.join(repo, f)):
        files[f], full_text[f] = parse_file(f)

# seed: non-entity members overlapping a changed range; entities only where
# the change falls outside every member (object header / ctor params) —
# otherwise a one-line member edit would flag the whole object's keys
stale = set()
stale_members = set()   # (file, name) of keyless helpers to propagate
lit_names = set()       # graft_* literals in changed lines
frontier = []


def seed(mem, text):
    keys = [k for k in KEY_RE.findall(text if mem.is_entity else mem.body)
            if k in certified]
    if keys:
        stale.update(keys)
    elif (mem.file, mem.name) not in stale_members:
        stale_members.add((mem.file, mem.name))
        frontier.append(mem)
    lit_names.update(GRAFT_RE.findall(text))


for f, rs in ranges.items():
    mems = files.get(f, [])
    if not mems:
        continue
    inner = [m for m in mems if not m.is_entity]
    if rs is not None and inner:
        first = min(m.start for m in inner)
        if any(s < first and f != "src/main/scala/graft/GraftExtensions.scala"
               for s, e in rs):
            pass  # header/import-only changes: handled via entity seeding below
    if rs is None:
        for m in mems:
            seed(m, m.body)
        continue
    covered = []
    for m in inner:
        lines = m.body.splitlines()
        touched = [lines[i] for i in range(len(lines))
                   if any(s <= m.start + i <= e for s, e in rs)]
        if touched:
            covered.extend(range(m.start, m.end + 1))
            seed(m, "\n".join(touched))
    cov = set(covered)
    for m in mems:
        if not m.is_entity:
            continue
        lines = m.body.splitlines()
        touched = [lines[i] for i in range(len(lines))
                   if (m.start + i) not in cov
                   and any(s <= m.start + i <= e for s, e in rs)]
        if touched:
            seed(m, "\n".join(touched))

# propagate helpers to referencers, to fixpoint. Cross-file: qualified
# Owner.member, or an imported entity name, or a graft_* literal. Same-file:
# bare word-boundary name.
W = r"[A-Za-z0-9_]"
for g in sorted(lit_names):
    ref = re.compile(r"(?<!%s)%s(?!%s)" % (W, re.escape(g), W))
    for f2, mems2 in files.items():
        for m2 in mems2:
            if not m2.is_entity and ref.search(m2.body):
                seed(m2, "")

visited = set()
while frontier:
    mem = frontier.pop()
    if (mem.file, mem.name) in visited:
        continue
    visited.add((mem.file, mem.name))
    bare = re.compile(r"(?<!%s)%s(?!%s)" % (W, re.escape(mem.name), W))
    if mem.is_entity:
        qual = bare
    else:
        qual = (re.compile(r"(?<!%s)%s\.%s(?!%s)" %
                           (W, re.escape(mem.owner), re.escape(mem.name), W))
                if mem.owner else None)
    for f2, mems2 in files.items():
        same = f2 == mem.file
        if not same and mem.is_entity:
            # entity referenced cross-file only where it is imported or
            # package-qualified
            if not re.search(r"(?:import .*|graft\.\w+)\.\{?[^\n]*\b%s\b"
                             % re.escape(mem.name), full_text[f2]):
                continue
        for m2 in mems2:
            if m2.is_entity or (f2, m2.name) in visited:
                continue
            hit = bare.search(m2.body) if same else (
                qual.search(m2.body) if qual else
                (mem.is_entity and bare.search(m2.body)))
            if hit:
                keys = [k for k in KEY_RE.findall(m2.body) if k in certified]
                if keys:
                    stale.update(keys)
                elif (f2, m2.name) not in stale_members:
                    stale_members.add((f2, m2.name))
                    frontier.append(m2)

if stale:
    print(f"sf1_stale: {len(stale)} certified keys changed since cert "
          f"commit {commit[:9]}:")
    print("  " + " ".join(sorted(stale)))
    sys.exit(1)
sys.exit(0)
