#!/usr/bin/env python
"""Train the toy quality-filter weights table (fastText-style linear
model) and ship it as recon_spark/data/quality_weights.parquet.

Fully deterministic — zero-init logistic regression, fixed iteration
count, no RNG — so re-running this script reproduces the committed
parquet byte-for-byte-equivalent values. The label is an independent
rule (quality proxy): a document is LOW quality when its rate of the
noise tokens {slow, dup, small} is above the corpus median — the model
has to learn negative weights for those tokens from bag-of-words counts
alone, which is exactly the CCNet/fastText quality-filter shape.

Weights are stored both as double (informational) and as
weight_micro = round(w * 1e6) BIGINT: the scoring operator sums the
integer micros so the per-document accumulation is EXACT in any engine
(no float summation-order drift between Spark and the DuckDB oracle).

Usage: python scripts/train_quality_weights.py [sf_dir] [out_parquet]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

NOISE_TOKENS = ("slow", "dup", "small")
ITERS = 500
LR = 0.5


def train(sf_dir: str) -> tuple[list[tuple[str, float, int]], float]:
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, string_split(text, ' ') AS toks "
        f"FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    vocab = sorted(
        {t for _, toks in rows for t in toks if t},
    )
    v_idx = {t: i for i, t in enumerate(vocab)}
    X = np.zeros((len(rows), len(vocab)), dtype=np.float64)
    noise_rate = np.zeros(len(rows))
    for r, (_, toks) in enumerate(rows):
        toks = [t for t in toks if t]
        for t in toks:
            X[r, v_idx[t]] += 1.0
        noise_rate[r] = sum(toks.count(nt) for nt in NOISE_TOKENS) / max(len(toks), 1)
    y = (noise_rate <= np.median(noise_rate)).astype(np.float64)  # 1 = good

    # features scaled by corpus-mean doc length so LR steps are sane;
    # the learned weights are then rescaled back to per-raw-count units
    mean_len = X.sum(axis=1).mean()
    Xs = X / mean_len

    w = np.zeros(len(vocab))
    b = 0.0
    n = len(rows)
    for _ in range(ITERS):
        z = Xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * (Xs.T @ g) / n
        b -= LR * g.mean()

    w_raw = w / mean_len  # per-raw-count weights (operator sums counts)
    acc = ((1.0 / (1.0 + np.exp(-(X @ w_raw + b))) >= 0.5) == y).mean()
    print(f"vocab={len(vocab)} docs={n} train-acc={acc:.3f} bias={b:.6f}")
    out = [
        (t, round(float(w_raw[i]), 6), int(round(float(w_raw[i]) * 1_000_000)))
        for t, i in sorted(v_idx.items())
    ]
    return out, round(float(b), 6)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, "recon_spark", "data", "quality_weights.parquet")
    )
    weights, bias = train(sf_dir)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # bias rides along as the '__bias__' pseudo-term (weight_micro holds
    # round(bias * 1e6)); scorers must exclude it from the token join
    rows = weights + [("__bias__", bias, int(round(bias * 1_000_000)))]
    table = pa.table(
        {
            "term": [r[0] for r in rows],
            "weight": [r[1] for r in rows],
            "weight_micro": [r[2] for r in rows],
        },
        schema=pa.schema(
            [("term", pa.string()), ("weight", pa.float64()), ("weight_micro", pa.int64())]
        ),
    )
    pq.write_table(table, out_path)
    print(f"wrote {out_path} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
