#!/usr/bin/env python3
"""Single-node pandas baseline for BASELINE.md: the reference project IS
pandas notebooks, so this times idiomatic pandas/numpy implementations of
the same eight headline computations the Spark plans run. Each is written
the way the reference's notebooks write it (vectorized where pandas makes
that natural, per-row python where it doesn't — e.g. shingling).

Usage: tools/baseline_pandas.py [sf_dir] [reps]
"""
import sys, os, json, time, string
import numpy as np
import pandas as pd

def load(sf, t):
    return pd.read_parquet(os.path.join(sf, f"{t}.parquet"))

def q01_agg(l, **_):
    return l.groupby(["l_returnflag", "l_linestatus"]).agg(
        n=("l_quantity", "size"), sum_qty=("l_quantity", "sum"),
        sum_price=("l_extendedprice", "sum"), avg_price=("l_extendedprice", "mean"),
        sum_disc=("l_discount", "sum"))

def q03_join_agg(l, o, c, **_):
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey") \
         .merge(c, left_on="o_custkey", right_on="c_custkey")
    return j.groupby("c_mktsegment").agg(
        n=("l_quantity", "size"), revenue=("l_extendedprice", "sum"))

def q05_window(o, **_):
    o = o.sort_values(["o_custkey", "o_totalprice"])
    g = o.groupby("o_custkey")
    return pd.DataFrame({
        "rank": g["o_totalprice"].rank(method="min", ascending=False),
        "running": g["o_totalprice"].cumsum()})

def q10_corr(l, **_):
    return l[["l_quantity", "l_extendedprice", "l_discount", "l_tax"]].corr()

def dd_minhash(docs, **_):
    # 5-char shingles, base-31 poly hash, 64 affine permutations mod 2^31-1
    p = 2147483647
    js = np.arange(64, dtype=np.int64)
    out = np.empty((len(docs), 64), dtype=np.int64)
    pow31 = np.array([31**4, 31**3, 31**2, 31, 1], dtype=np.int64)
    for i, t in enumerate(docs["text"].to_numpy()):
        b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int64)
        if len(b) < 5:
            out[i] = 0
            continue
        win = np.lib.stride_tricks.sliding_window_view(b, 5)
        x = np.unique((win * pow31).sum(axis=1) % 1000000007)
        out[i] = (((2 * js[:, None] + 1) * x[None, :] + 12345 * js[:, None]) % p).min(axis=1)
    return out

def sim_brute_topk(emb, **_):
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q, c = m[:10], m[10:]
    sims = (q @ c.T) / (np.linalg.norm(q, axis=1)[:, None] * np.linalg.norm(c, axis=1)[None, :])
    return np.argsort(-sims, axis=1)[:, :5]

STOP = {"the", "a", "and", "of", "to", "in", "is", "it", "for", "on"}
def tx_quality(docs, **_):
    t = docs["text"]
    n = t.str.len()
    punct = t.str.count(r"[^\w\s]")
    words = t.str.split()
    stop_ratio = words.map(lambda ws: sum(w in STOP for w in ws) / max(len(ws), 1))
    wlen = words.map(lambda ws: sum(map(len, ws)) / max(len(ws), 1))
    return pd.DataFrame({"len": n, "punct_ratio": punct / n,
                         "stop_ratio": stop_ratio, "avg_word_len": wlen})

def st_window_agg(e, **_):
    return e.groupby([e["ts"].dt.floor("h"), "event_type"]).agg(
        n=("value", "size"), sum_value=("value", "sum"))

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    l, o, c = load(sf, "lineitem"), load(sf, "orders"), load(sf, "customer")
    docs, emb, e = load(sf, "documents"), load(sf, "embeddings"), load(sf, "events")
    tasks = {
        "q01_agg": lambda: q01_agg(l),
        "q03_join_agg": lambda: q03_join_agg(l, o, c),
        "q05_window": lambda: q05_window(o),
        "q10_corr": lambda: q10_corr(l),
        "dd_minhash": lambda: dd_minhash(docs),
        "sim_brute_topk": lambda: sim_brute_topk(emb),
        "tx_quality": lambda: tx_quality(docs),
        "st_window_agg": lambda: st_window_agg(e),
    }
    out = {}
    for name, fn in tasks.items():
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        out[name] = min(times)
    print(json.dumps({"baseline": "pandas", "sf": sf, "reps": reps,
                      "queries": {k: round(v, 3) for k, v in out.items()},
                      "total": round(sum(out.values()), 3)}))

if __name__ == "__main__":
    main()
