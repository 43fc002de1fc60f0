#!/usr/bin/env python3
"""Round-close gate: structural checks that have failed by drift three
rounds running (r7 stale claim, r8 doc-before-fold, r9 code-after-fold).
Run as the LAST act before the end-of-round snapshot commit; a non-zero
exit means the snapshot is not ready.

Checks:
  1. every `SparkEntry.queries` key has a SURVEY.md inventory mention
  2. BENCH_SELF.json exists, is git-tracked and unmodified (committed),
     and its query set == SparkEntry's key set
  3. the SCALING.md generated bench section's total and gate count match
     the committed BENCH_SELF.json verbatim
  4. CORRECTNESS_SELF.json exists, is committed, records zero failures,
     and covers exactly SparkEntry's key set

Usage: python3 tools/round_close.py   (from the repo root)
"""
import json
import os
import re
import subprocess
import sys

FAILS = []


def fail(msg: str) -> None:
    FAILS.append(msg)
    print(f"FAIL {msg}")


def ok(msg: str) -> None:
    print(f"  ok {msg}")


def spark_entry_keys() -> set:
    src = open("src/main/scala/graft/SparkEntry.scala").read()
    # registrations look like:  "q_name" -> (...)
    return set(re.findall(r'"(q[\w]*)"\s*->', src))


def committed(path: str) -> bool:
    tracked = subprocess.run(["git", "ls-files", "--error-unmatch", path],
                             capture_output=True).returncode == 0
    if not tracked:
        return False
    dirty = subprocess.run(["git", "diff", "--quiet", "HEAD", "--", path],
                           capture_output=True).returncode != 0
    return not dirty


def main() -> int:
    keys = spark_entry_keys()
    print(f"SparkEntry.queries: {len(keys)} keys")

    # 1. SURVEY inventory coverage
    survey = open("SURVEY.md").read()
    missing = sorted(k for k in keys if k not in survey)
    if missing:
        fail(f"SURVEY.md missing inventory rows for: {', '.join(missing)}")
    else:
        ok("every SparkEntry key appears in SURVEY.md")

    # 2. bench artifact committed and complete
    if not os.path.exists("BENCH_SELF.json"):
        fail("BENCH_SELF.json missing — run the final fold first")
    else:
        bench = json.load(open("BENCH_SELF.json"))
        bq = set(bench["queries"])
        if bq != keys:
            fail("BENCH_SELF.json query set != SparkEntry keys "
                 f"(bench-only: {sorted(bq - keys)}; unbenched: {sorted(keys - bq)})"
                 " — a gate was registered after the fold")
        else:
            ok(f"bench fold covers all {len(bq)} gates")
        if not committed("BENCH_SELF.json"):
            fail("BENCH_SELF.json is not committed (tracked + clean) — the"
                 " SCALING section's provenance claim requires the artifact"
                 " at HEAD")
        else:
            ok("BENCH_SELF.json committed")

        # 3. SCALING.md section matches the artifact
        scaling = open("SCALING.md").read()
        totals = re.findall(
            r"total: \*\*([\d.]+) s\*\* over (\d+) gates", scaling)
        if not totals:
            fail("SCALING.md has no generated bench section")
        else:
            t, n = totals[-1]  # the latest round's section
            if abs(float(t) - bench["value"]) > 0.005:
                fail(f"SCALING.md bench total {t} s != artifact "
                     f"{bench['value']:.2f} s — regenerate the section"
                     " (tools/bench_section.py) from the final fold")
            elif int(n) != len(bench["queries"]):
                fail(f"SCALING.md gate count {n} != artifact "
                     f"{len(bench['queries'])}")
            else:
                ok(f"SCALING.md section matches the artifact "
                   f"({t} s / {n} gates)")

    # 4. correctness artifact committed, green, complete
    if not os.path.exists("CORRECTNESS_SELF.json"):
        fail("CORRECTNESS_SELF.json missing — run the gate with"
             " CHECK_JSON_OUT=CORRECTNESS_SELF.json")
    else:
        corr = json.load(open("CORRECTNESS_SELF.json"))
        if corr.get("fail", 1) != 0:
            fail(f"CORRECTNESS_SELF.json records {corr['fail']} failing"
                 " gate(s)")
        else:
            ok(f"correctness artifact green ({corr['pass']} pass)")
        cq = set(corr.get("gates", {}))
        if cq != keys:
            fail("CORRECTNESS_SELF.json gate set != SparkEntry keys "
                 f"(extra: {sorted(cq - keys)}; unchecked: {sorted(keys - cq)})")
        else:
            ok("correctness artifact covers every gate")
        if not committed("CORRECTNESS_SELF.json"):
            fail("CORRECTNESS_SELF.json is not committed")
        else:
            ok("CORRECTNESS_SELF.json committed")

    if FAILS:
        print(f"\nround NOT ready to close: {len(FAILS)} check(s) failed")
        return 1
    print("\nround-close checks green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
