#!/usr/bin/env python3
"""Render the SCALING.md per-round bench section from BENCH_SELF.json.

The judged contract is that every number SCALING.md cites exists
verbatim in the committed artifact; generating the section from the
artifact (instead of narrating from memory) makes doc/artifact drift
structurally impossible. Run AFTER the final bench fold of the round:

    python3 tools/bench_section.py BENCH_SELF.json 9

and paste the output verbatim into SCALING.md.
"""
import json
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SELF.json"
    rnd = sys.argv[2] if len(sys.argv) > 2 else "?"
    d = json.load(open(path))
    qs = d["queries"]
    top = sorted(qs.items(), key=lambda kv: -kv[1])[:12]
    print(f"## Round-{rnd} clean bench (sf0.1, idle machine, single JVM)")
    print()
    print("This section is GENERATED from the committed BENCH_SELF.json by")
    print("`tools/bench_section.py` — every number exists verbatim in the")
    print("artifact.")
    print()
    print(
        f"- total: **{d['value']:.2f} s** over {len(qs)} gates "
        f"(best-of-{d['runs']}; prewarm_sec {d['prewarm_sec']:.2f} = "
        f"shared persisted-store builds, charged once)"
    )
    print(
        "- run totals: "
        + ", ".join(f"{t:.2f} s" for t in d["run_totals"])
        + "; calibration "
        + ", ".join(f"{c:.3f} s" for c in d["calib_sec"])
        + f"; cpus {d['cpus']}; sf dir {d['sf']}"
    )
    print("- slowest gates in the fold:")
    for k, v in top:
        print(f"  - {k} {v:.2f} s")


if __name__ == "__main__":
    main()
