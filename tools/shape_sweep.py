#!/usr/bin/env python3
"""Cluster-shape invariance sweep (r8 verdict #2).

Graft's determinism story — Z-mod-p gates, order-independent decimal /
grid sums, explicit tiebreaks — claims BIT-IDENTICAL results on any
cluster shape. This proves it: run the full graft.Verify dump under
several (cores, shuffle-partitions) shapes and compare a canonical
per-query hash of every output across shapes. Any query whose output
depends on partitioning is a real bug found cheap.

Shapes swept (baseline first):
  local[32] x 32 shuffle partitions   (the driver's shape)
  local[32] x  7 shuffle partitions   (fewer reducers than cores)
  local[32] x 257 shuffle partitions  (more reducers than data splits)
  local[4]  x 32 shuffle partitions   (narrow executor)

Usage: tools/shape_sweep.py [sf_dir] [work_dir]
  defaults: /root/testdata/sf0.01  target/shape_sweep
Exit 0 iff every query hashes identically across all shapes.
"""
import hashlib
import json
import os
import subprocess
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
WORK = sys.argv[2] if len(sys.argv) > 2 else "target/shape_sweep"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SHAPES = [
    ("c32_s32", {"SPARK_GRAFT_CPUS": "32", "SPARK_GRAFT_SHUFFLE": "32"}),
    ("c32_s7", {"SPARK_GRAFT_CPUS": "32", "SPARK_GRAFT_SHUFFLE": "7"}),
    ("c32_s257", {"SPARK_GRAFT_CPUS": "32", "SPARK_GRAFT_SHUFFLE": "257"}),
    ("c4_s32", {"SPARK_GRAFT_CPUS": "4", "SPARK_GRAFT_SHUFFLE": "32"}),
]


def run_verify(tag, env_extra):
    out = f"{WORK}/{tag}"
    env = dict(os.environ)
    env.update(env_extra)
    print(f"== verify {tag} -> {out}", flush=True)
    subprocess.run([f"{REPO}/tools/run.sh", "graft.Verify", SF, out],
                   env=env, check=True, cwd=REPO)
    return out


def canonical_hash(con, path):
    """Hash of (sorted columns, sorted rows, exact values) of one dump."""
    df = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchdf()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    h.update(("|".join(df.columns)).encode())
    # repr round-trips doubles exactly, so a 1-ulp shape-dependence is a
    # hash mismatch, not a tolerance pass
    for col in df.columns:
        for v in df[col].tolist():
            h.update(repr(v).encode())
            h.update(b"\x00")
    return h.hexdigest()


def main():
    os.makedirs(WORK, exist_ok=True)
    dirs = [(tag, run_verify(tag, env)) for tag, env in SHAPES]
    con = duckdb.connect()
    base_tag, base_dir = dirs[0]
    names = sorted(d for d in os.listdir(base_dir)
                   if os.path.isdir(f"{base_dir}/{d}"))
    print(f"== hashing {len(names)} queries x {len(dirs)} shapes", flush=True)
    n_bad = 0
    report = {}
    for name in names:
        hashes = {}
        for tag, d in dirs:
            try:
                hashes[tag] = canonical_hash(con, f"{d}/{name}")
            except Exception as e:
                hashes[tag] = f"ERROR:{type(e).__name__}:{e}"
        if len(set(hashes.values())) == 1:
            report[name] = "ok"
        else:
            n_bad += 1
            report[name] = hashes
            print(f"SHAPE-DEPENDENT {name}: {hashes}", flush=True)
    with open(f"{WORK}/report.json", "w") as f:
        json.dump({"sf": SF, "shapes": [t for t, _ in SHAPES],
                   "queries": len(names), "shape_dependent": n_bad,
                   "detail": report}, f, indent=1)
    print(f"== {len(names) - n_bad}/{len(names)} shape-invariant, "
          f"{n_bad} shape-dependent ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
