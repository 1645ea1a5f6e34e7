"""Benchmark: ungapped genome-scan throughput on the local accelerator.

Measures the batched diagonal-monoid scan kernel (the exhaustive ungapped
engine: exact best local ungapped alignment per pair) in GCUPS
(giga cell updates per second; cells = B * Q * T).

vs_baseline compares against a single-core NumPy implementation of the
same computation measured inline (the reference C exonerate cannot be
built in this image — no glib; BASELINE.md records that the reference
publishes no perf numbers, so the single-core CPU oracle is the baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def numpy_baseline_gcups(submat, q_idx, t_idx) -> float:
    """Single-core vectorized NumPy of the same monoid scan."""
    Q, T = len(q_idx), len(t_idx)
    t0 = time.perf_counter()
    grid = submat[q_idx[:, None], t_idx[None, :]]
    best = 0
    # vectorized Kadane across diagonals: iterate rows, carry per-diagonal
    # running scores on the skewed axis
    nd = Q + T
    cur = np.zeros(nd, dtype=np.int64)
    for i in range(Q):
        row = np.zeros(nd, dtype=np.int64)
        off = Q - 1 - i
        row[off:off + T] = grid[i]
        cur = np.maximum(cur + row, row)
        np.maximum(cur, 0, out=cur)
        m = cur.max()
        if m > best:
            best = m
    dt = time.perf_counter() - t0
    return (Q * T) / dt / 1e9, int(best)


def main():
    import jax
    from exonerate_tpu.parallel.ungapped_scan import single_device_scan
    from exonerate_tpu.submat import Submat, SYMBOL_INDEX

    platform = jax.default_backend()
    sub = Submat.create("nucleic")
    rng = np.random.default_rng(42)
    acgt = np.array([SYMBOL_INDEX[ord(c)] for c in "ACGT"])

    # bench shape: 32 queries of 512 vs a 32k target
    B, Q = 32, 512
    S, Tt = 16, 2048
    T = S * Tt
    q_codes = acgt[rng.integers(0, 4, (B, Q))].astype(np.int32)
    t_codes = acgt[rng.integers(0, 4, T)].astype(np.int32)
    t_tiles = t_codes.reshape(S, Tt)
    starts = (np.arange(S) * Tt).astype(np.int32)

    fn = single_device_scan(sub.matrix)
    # compile + warmup
    out = np.asarray(fn(q_codes, t_tiles, starts))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = fn(q_codes, t_tiles, starts)
    out = np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    cells = B * Q * T
    gcups = cells / dt / 1e9

    # single-core numpy baseline on a smaller slice, per-cell extrapolated
    base_gcups, base_best = numpy_baseline_gcups(
        sub.matrix, q_codes[0], t_codes[: T // 4])

    print(json.dumps({
        "metric": f"ungapped_scan_gcups_{platform}",
        "value": round(float(gcups), 3),
        "unit": "GCUPS",
        "vs_baseline": round(float(gcups / base_gcups), 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
