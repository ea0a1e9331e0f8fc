#!/usr/bin/env python3
"""One-command fifth-decade (sf100) residual requeue + consolidation.

r12 grew five ad-hoc retry scripts (sf100_r12_retry/requeue/run3/
final/q94b.sh); this driver replaces them (verdict r12 task #6):

  1. read the previous round's SF100 artifact, queue its red +
     unattempted keys (plus any extra keys passed on the CLI),
  2. run each batch with a pre-flight disk check (skip, don't poison:
     the r11/r12 sweeps lost ~6 oracle runs to a full shared FS),
     wiping dumps + DuckDB temp between batches,
  3. write logs into the COMMITTED logs/sf100_<round>/ directory
     (ADVICE r12: target/ is gitignored, so the r12 artifact's
     provenance pointed at files that wouldn't survive a reset),
  4. consolidate every committed round's logs + the r9/r10 JSON
     artifacts into SF100_<round>.json with per-key provenance.

Consolidation precedence (ADVICE r12): the NEWEST round that attempted
a key decides its color — a fresh FAIL is never masked by an older
green; instead the key goes red and the old evidence is listed in
"stale_green_conflicts". Within one round a PASS supersedes an earlier
FAIL (retries), ordered by log mtime, not filename.

Usage: tools/sf100_requeue.py [--round 13] [--base SF100_r12.json]
         [--out SF100_r13.json] [--min-free-gb 40]
         [--consolidate-only] [key ...]
"""
import argparse
import glob
import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SF100_DIR", "target/testdata/sf100")

# compare mode + env per residual class (everything else: check).
#   check    — oracle_check.py pandas cell compare (tiny outputs)
#   except   — oracle_except.py streamed EXCEPT ALL
#   multiset — oracle_multiset.py order-independent fingerprint
#   pagerank_staged / quantiles_staged — per-stage replays
MODES = {
    "q94_market_basket":    ("basketpairs_staged", {"SPARK_GRAFT_VERIFY_COALESCE": "0", "SPARK_GRAFT_SHUFFLE": "256"}),
    "q113_item_sim":        ("basketpairs_staged", {"SPARK_GRAFT_VERIFY_COALESCE": "0", "SPARK_GRAFT_SHUFFLE": "256"}),
    "q114_triangles":       ("check",    {"SPARK_GRAFT_SHUFFLE": "256"}),
    # kcore's 3-core of the n_ab>=2 co-purchase graph peels to EMPTY on
    # the sf100 upsample (measured r13, per-round survivor counts in the
    # staged log) — acknowledge so the vacuous-compare guard stays armed
    # for q94/q113 in the same batched run (key-scoped env)
    "graph_kcore":          ("basketpairs_staged", {"SPARK_GRAFT_VERIFY_COALESCE": "0", "SPARK_GRAFT_SHUFFLE": "256", "ORACLE_BP_EXPECT_EMPTY": "graph_kcore"}),
    "q36_melt":             ("multiset", {"SPARK_GRAFT_VERIFY_COALESCE": "0"}),
    "q43_grouped_winsorize": ("multiset", {"SPARK_GRAFT_VERIFY_COALESCE": "0"}),
    "q54_mahalanobis":      ("multiset", {"SPARK_GRAFT_VERIFY_COALESCE": "0"}),
    "q63_group_percent_rank": ("multiset", {"SPARK_GRAFT_VERIFY_COALESCE": "0"}),
    "q98_pagerank":         ("pagerank_staged", {}),
    "q60_grouped_mad":      ("quantiles_staged", {}),
    "q07_quantiles":        ("quantiles_staged", {}),
    "q33_group_quantiles":  ("quantiles_staged", {}),
}

# most-expensive last, so cheap greens land even if the disk window closes
ORDER_WEIGHT = {"check": 0, "quantiles_staged": 1, "basketpairs_staged": 2,
                "except": 2, "pagerank_staged": 3, "multiset": 4}
HEAVIEST_LAST = ["q36_melt"]  # 1.8B-row surface: always the final batch


def free_gb(path="."):
    st = os.statvfs(path)
    return st.f_bavail * st.f_frsize / 1e9


def wipe(round_tag):
    for p in glob.glob(f"target/tmp_sf100_{round_tag}_*") + [
            "target/ducktmp", "target/ducktmp_staged", "target/ducktmp_r"]:
        shutil.rmtree(p, ignore_errors=True)


def run_batch(keys, round_tag, log_dir, min_free):
    """One verify + one compare for `keys` (a singleton for every mode
    except basketpairs_staged, whose keys batch into ONE invocation so
    the shared baskets+pair-count build — the expensive ~600M-row stage
    — runs once, not once per key; ADVICE r13). Per-key env overrides
    merge left-to-right (the only multi-key mode's overrides are
    identical except the key-scoped expected-empty list)."""
    key = "+".join(keys)
    mode, _ = MODES.get(keys[0], ("check", {}))
    env_over = {}
    for k in keys:
        env_over.update(MODES.get(k, ("check", {}))[1])
    log = os.path.join(log_dir, f"{key}.log")
    out = f"target/tmp_sf100_{round_tag}_{key}"
    lf = open(log, "a")

    def say(msg):
        print(msg)
        lf.write(msg + "\n")
        lf.flush()

    if free_gb() < min_free:
        say(f"SKIP {key}: free disk {free_gb():.1f} GB < {min_free} GB floor")
        lf.close()
        return
    say(f"== {key} ({mode}) free={free_gb():.1f}GB")
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "60g"),
               ORACLE_DUCKDB_MEM=os.environ.get("ORACLE_DUCKDB_MEM", "80GB"),
               ORACLE_DUCKDB_TMP="target/ducktmp", **env_over)
    try:
        p = subprocess.run(["tools/run.sh", "graft.Verify", SF, out] + keys,
                           env=env, stdout=lf, stderr=subprocess.STDOUT,
                           cwd=REPO)
        if p.returncode != 0:
            say(f"FAIL {key}: verify exited {p.returncode}")
            return
        if mode == "pagerank_staged":
            cmd = ["python3", "tools/oracle_pagerank_staged.py", SF, out]
        elif mode == "basketpairs_staged":
            cmd = ["python3", "tools/oracle_basketpairs_staged.py", SF, out] + keys
        elif mode == "quantiles_staged":
            cmd = ["python3", "tools/oracle_quantiles_staged.py", SF, out] + keys
        elif mode in ("except", "multiset"):
            cmd = ["python3", f"tools/oracle_{mode}.py", SF, out] + keys
        else:
            cmd = ["python3", "tools/oracle_check.py", SF, out] + keys
        q = subprocess.run(["flock", "-w", "86400", "target/.duck.lock"] + cmd,
                           env=env, stdout=lf, stderr=subprocess.STDOUT,
                           cwd=REPO)
        if q.returncode != 0:
            say(f"FAIL {key}: compare exited {q.returncode}")
    finally:
        shutil.rmtree(out, ignore_errors=True)
        wipe(round_tag)
        lf.close()


def scan_logs(log_dir):
    """key -> ('PASS'/'FAIL', tag, detail). WITHIN a round any PASS wins
    over any FAIL regardless of log order (a round runs one HEAD;
    retries exist precisely because co-tenant disk/OOM failures are
    transient — and the r12 logs were cp'd into the committed dir, so
    their mtimes no longer order attempts). Cross-round precedence is
    newest-attempt-wins, handled by the caller."""
    results = {}
    for log in sorted(glob.glob(os.path.join(log_dir, "*.log"))):
        tag = os.path.basename(log)[:-len(".log")]
        tag = re.sub(r"^sf100_r\d+_", "", tag)
        for line in open(log, errors="replace"):
            m = re.match(r"PASS (\S+)", line)
            if m:
                results[m.group(1)] = ("PASS", tag, "")
                continue
            m = re.match(r"FAIL ([^\s:]+):?\s*(.*)", line)
            if m and results.get(m.group(1), ("",))[0] != "PASS":
                results[m.group(1)] = ("FAIL", tag, m.group(2).strip()[:200])
    return results


def consolidate(out_path, round_no):
    c = json.load(open(os.path.join(REPO, "CORRECTNESS_r13.json")))
    entries = c.get("queries", c)
    oracle_keys = sorted(k for k, v in entries.items()
                         if isinstance(v, dict) and v.get("err") != "no_oracle")

    r9 = json.load(open(os.path.join(REPO, "SF100_r9.json")))
    r10 = json.load(open(os.path.join(REPO, "SF100_r10.json")))
    # round -> {key: (verdict, provenance, detail)}; JSON artifacts carry
    # greens only (their reds were requeued by their own rounds)
    rounds = {9: {k: ("PASS", "r9", "") for k in r9["queries"]},
              10: {k: ("PASS", "r10", "") for k in r10["ext_green_queries"]}}
    for d in sorted(glob.glob(os.path.join(REPO, "logs", "sf100_r*"))):
        m = re.match(r"sf100_r(\d+)$", os.path.basename(d))
        if not m:
            continue
        n = int(m.group(1))
        rounds[n] = {k: (v, f"r{n}:{tag}", det)
                     for k, (v, tag, det) in scan_logs(d).items()}

    green, red, conflicts = {}, {}, {}
    for k in oracle_keys:
        attempts = [(n, rounds[n][k]) for n in sorted(rounds) if k in rounds[n]]
        if not attempts:
            continue
        n_new, (verdict, prov, det) = attempts[-1]
        if verdict == "PASS":
            green[k] = prov
        else:
            red[k] = f"{prov}: {det}"
            older_green = [p for _, (v, p, _) in attempts[:-1] if v == "PASS"]
            if older_green:
                conflicts[k] = older_green[-1]
    unattempted = [k for k in oracle_keys if k not in green and k not in red]

    doc = {
        "sf": SF,
        "scope": (f"round-{round_no} consolidation: newest-attempt-wins "
                  "union of logs/sf100_r*/ (committed) over the r9 probe "
                  "and r10 extension JSON artifacts"),
        "oracle_total": len(oracle_keys),
        "green_total": len(green),
        "green": green,
        "red": red,
        "stale_green_conflicts": conflicts,
        "unattempted": unattempted,
        "note": ("provenance rN:<tag> points at logs/sf100_rN/<tag>.log "
                 "(committed; r12 tags map to the batch files copied from "
                 "target/). A red with a stale_green_conflicts entry means "
                 "an older round passed the key on an earlier data "
                 "generation — the fresh failure wins (ADVICE r12)."),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
    print(f"{out_path}: {len(green)}/{len(oracle_keys)} green, "
          f"{len(red)} red, {len(unattempted)} unattempted, "
          f"{len(conflicts)} stale-green conflicts")
    for k, v in red.items():
        print(f"  RED {k}: {v}")
    if unattempted:
        print("  unattempted:", " ".join(unattempted))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=13)
    ap.add_argument("--base", default="SF100_r12.json")
    ap.add_argument("--out", default=None)
    ap.add_argument("--min-free-gb", type=float, default=40.0)
    ap.add_argument("--consolidate-only", action="store_true")
    ap.add_argument("keys", nargs="*")
    a = ap.parse_args()
    round_tag = f"r{a.round}"
    out_path = a.out or os.path.join(REPO, f"SF100_{round_tag}.json")
    os.chdir(REPO)

    if not a.consolidate_only:
        base = json.load(open(os.path.join(REPO, a.base)))
        queue = list(base.get("red", {})) + list(base.get("unattempted", []))
        queue += [k for k in a.keys if k not in queue]
        seen = set()
        queue = [k for k in queue if not (k in seen or seen.add(k))]
        queue.sort(key=lambda k: (k in HEAVIEST_LAST,
                                  ORDER_WEIGHT.get(MODES.get(k, ("check",))[0], 0), k))
        # batch the basket-pair keys into ONE invocation: the staged tool
        # shares the expensive baskets+pair-count build across its keys
        bp = [k for k in queue if
              MODES.get(k, ("check",))[0] == "basketpairs_staged"]
        groups, bp_queued = [], False
        for k in queue:
            if k in bp:
                if not bp_queued:
                    groups.append(bp)
                    bp_queued = True
            else:
                groups.append([k])
        log_dir = os.path.join(REPO, "logs", f"sf100_{round_tag}")
        os.makedirs(log_dir, exist_ok=True)
        print(f"requeue {len(queue)} keys: {' '.join(queue)}")
        for g in groups:
            run_batch(g, round_tag, log_dir, a.min_free_gb)

    consolidate(out_path, a.round)


if __name__ == "__main__":
    main()
