#!/usr/bin/env python3
"""Consolidate the fifth-decade (sf100) oracle evidence into one
committed artifact: SF100_r12.json = union of

  - SF100_r9.json   (22-query magnitude probe),
  - SF100_r10.json  (130-query extension),
  - this round's target/sf100_r12_*.log batches (the r11 sweep's
    results lived in /tmp + uncommitted logs and did not survive the
    sandbox reset — r12 re-earns them on regenerated data).

Every oracle-checked SparkEntry key gets a status: green (sf100
oracle-verified in some round, with provenance), red (attempted this
round, failed — listed with the failure line), or unattempted.
Exclusions must be argued in the "excluded" map by the author.

Usage: tools/sf100_consolidate.py [out_json]
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "SF100_r12.json")
    r9 = json.load(open(os.path.join(REPO, "SF100_r9.json")))
    r10 = json.load(open(os.path.join(REPO, "SF100_r10.json")))
    g9 = set(r9["queries"])
    g10 = set(r10["ext_green_queries"])

    # oracle key set = CORRECTNESS entries with a DuckDB oracle
    c11 = json.load(open(os.path.join(REPO, "CORRECTNESS_r11.json")))
    entries = c11.get("queries", c11)
    oracle_keys = sorted(k for k, v in entries.items()
                         if isinstance(v, dict) and v.get("err") != "no_oracle")

    g12, red12 = {}, {}
    for log in sorted(glob.glob(os.path.join(REPO, "target", "sf100_r12_*.log"))):
        tag = os.path.basename(log)[len("sf100_r12_"):-len(".log")]
        for line in open(log, errors="replace"):
            m = re.match(r"PASS (\S+)", line)
            if m:
                g12[m.group(1)] = tag
                red12.pop(m.group(1), None)  # a later pass supersedes
                continue
            m = re.match(r"FAIL ([^\s:]+):?\s*(.*)", line)
            if m and m.group(1) not in g12:
                red12[m.group(1)] = f"{tag}: {m.group(2).strip()[:200]}"

    green = {}
    for k in oracle_keys:
        if k in g12:
            green[k] = f"r12:{g12[k]}"
        elif k in g10:
            green[k] = "r10"
        elif k in g9:
            green[k] = "r9"
    red = {k: v for k, v in red12.items() if k in oracle_keys and k not in green}
    unattempted = [k for k in oracle_keys if k not in green and k not in red]

    doc = {
        "sf": "target/testdata/sf100",
        "scope": ("round-12 consolidation: union of the r9 probe, the r10 "
                  "extension, and this round's re-run of the r11 sweep (whose "
                  "results did not survive the sandbox reset) plus the six "
                  "r11 disk-blocked oracles"),
        "oracle_total": len(oracle_keys),
        "green_total": len(green),
        "green": green,
        "red": red,
        "unattempted": unattempted,
        "note": ("r12 logs: target/sf100_r12_*.log (committed); compare modes "
                 "per batch in tools/sf100_r12_run.sh — check = pandas cell "
                 "compare, except = streamed EXCEPT ALL, multiset = "
                 "order-independent fingerprint, staged = per-stage replay "
                 "(pagerank, grouped quantiles)"),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
    print(f"{out_path}: {len(green)}/{len(oracle_keys)} green, "
          f"{len(red)} red, {len(unattempted)} unattempted")
    for k, v in red.items():
        print(f"  RED {k}: {v}")
    if unattempted:
        print("  unattempted:", " ".join(unattempted))


if __name__ == "__main__":
    main()
