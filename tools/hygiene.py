#!/usr/bin/env python3
"""Round-close hygiene gate (r11 verdict item 3).

Checks, mechanically, that the test evidence matches the tree:
  1. The set of JUnit report files under target/test-reports equals
     the set of live ScalaTest suites in src/test (no orphan reports
     from deleted suites, no suite missing a report).
  2. Every report file's mtime postdates the newest source-file
     mtime (src/ + build.sbt) — i.e. the suite run is FRESH for the
     code being shipped (file mtimes, not commit time: a commit made
     right after a green run must not mark its own reports stale).
  3. Every report carries failures="0" errors="0".

Exit 0 = clean; exit 1 = violations listed on stderr.
Run it at round close:  python3 tools/hygiene.py
"""
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPORTS = os.path.join(REPO, "target", "test-reports")


def live_suites():
    suites = set()
    for root, _, files in os.walk(os.path.join(REPO, "src", "test")):
        for f in files:
            if not f.endswith(".scala"):
                continue
            path = os.path.join(root, f)
            text = open(path, encoding="utf-8").read()
            pkg = re.search(r"^package\s+([\w.]+)", text, re.M)
            pkg = pkg.group(1) if pkg else ""
            # tolerant of wrapped `extends` clauses (\s+ spans
            # newlines), type/constructor params on the class, and a
            # dotted base-class path — r12 advice: a stricter pattern
            # missed legal suite shapes and flagged their legitimate
            # reports as orphans
            for m in re.finditer(
                    r"^(?:abstract\s+)?class\s+(\w+)(?:\[[^\]]*\])?"
                    r"(?:\([^)]*\))?\s+extends\s+[\w.]*"
                    r"(?:AnyFunSuite|AnyFlatSpec|SuiteBase)", text, re.M):
                if "abstract" in m.group(0):
                    continue
                suites.add((pkg + "." if pkg else "") + m.group(1))
    return suites


def report_suites():
    if not os.path.isdir(REPORTS):
        return {}
    out = {}
    for f in os.listdir(REPORTS):
        m = re.match(r"TEST-(.+)\.xml$", f)
        if m:
            out[m.group(1)] = os.path.join(REPORTS, f)
    return out


def last_source_edit_epoch():
    """Freshness baseline = the newest SOURCE FILE mtime (src/ +
    build.sbt), not the last commit time: a commit made right after a
    green run must not mark reports stale — the reports were produced
    from exactly that tree. File mtimes capture "tests ran after the
    last edit", which is the property the gate actually wants."""
    latest = 0.0
    for root, _, files in os.walk(os.path.join(REPO, "src")):
        for f in files:
            p = os.path.join(root, f)
            try:
                latest = max(latest, os.path.getmtime(p))
            except OSError:
                pass
    bs = os.path.join(REPO, "build.sbt")
    if os.path.exists(bs):
        latest = max(latest, os.path.getmtime(bs))
    return latest


def main():
    bad = []
    live = live_suites()
    reports = report_suites()
    for orphan in sorted(set(reports) - live):
        bad.append(f"orphan report (suite not in tree): {orphan}")
    for missing in sorted(live - set(reports)):
        bad.append(f"live suite with no report: {missing}")
    src_t = last_source_edit_epoch()
    for name, path in sorted(reports.items()):
        if os.path.getmtime(path) < src_t:
            bad.append(f"stale report (predates last src edit): {name}")
        head = open(path, encoding="utf-8").read(4096)
        m = re.search(r'failures="(\d+)"[^>]*errors="(\d+)"', head)
        if not m:
            m = re.search(r'errors="(\d+)"[^>]*failures="(\d+)"', head)
        if not m or m.group(1) != "0" or m.group(2) != "0":
            bad.append(f"report not green: {name}")
    if bad:
        for b in bad:
            print(f"[hygiene] {b}", file=sys.stderr)
        print(f"[hygiene] {len(bad)} violation(s)", file=sys.stderr)
        return 1
    print(f"[hygiene] OK: {len(live)} suites, every report fresh "
          f"(last src edit {src_t:.0f}) and green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
