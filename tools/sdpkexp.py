"""SDP band-scan kernel timings (TPU): kernel-only cost of the fused
reverse+forward passes on scan-scale comparisons.

Builds N est2genome comparisons (mutated cDNA vs a 1 Mb synthetic
genome with planted exons), plans bands, and times sdp_pallas.run_kernel
per bucket — separating compile, first-call, and warm min-of-N — plus
the equivalent host-native scheduler time for the same loci.

Usage: python tools/sdpkexp.py [n_pairs] [target_len]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import exonerate_tpu

exonerate_tpu.enable_compilation_cache()

from exonerate_tpu.seqio import Sequence  # noqa: E402
from exonerate_tpu.model.registry import ModelType, get_model  # noqa: E402
from exonerate_tpu.alphabet import AlphabetType  # noqa: E402
from exonerate_tpu.model.data import AlignData  # noqa: E402
from exonerate_tpu.engine.sdp import SDPPair, SdpArgs  # noqa: E402
from exonerate_tpu.engine import sdp_hybrid, sdp_pallas  # noqa: E402


def build_pairs(n_pairs: int, tlen: int):
    rng = np.random.default_rng(5)
    bg = rng.choice(list("ACGT"), tlen)
    model = get_model(ModelType.EST2GENOME, AlphabetType.DNA,
                      AlphabetType.DNA)
    jobs = []
    from types import SimpleNamespace
    for k in range(n_pairs):
        # three exons planted at a per-pair locus
        exons = ["".join(rng.choice(list("ACGT"), 400)) for _ in range(3)]
        g = bg.copy()
        pos = 3000 + k * (tlen - 20000) // max(n_pairs, 1)
        hsps = []
        qoff = 0
        cdna = "".join(exons)
        for i, ex in enumerate(exons):
            g[pos:pos + len(ex)] = list(ex)
            hsps.append((qoff + 50, pos + 50, 100,
                         int(rng.integers(120, 300))))
            qoff += len(ex)
            pos += len(ex)
            if i < 2:
                ilen = 400 + 200 * i
                g[pos] = "G"
                g[pos + 1] = "T"
                g[pos + ilen - 2] = "A"
                g[pos + ilen - 1] = "G"
                pos += ilen
        q = list(cdna)
        for _ in range(24):
            q[int(rng.integers(0, len(q)))] = str(rng.choice(list("ACGT")))
        qs = Sequence(f"q{k}", None, "".join(q))
        ts = Sequence("t", None, "".join(g))
        data = AlignData(qs, ts)
        hl = [SimpleNamespace(query_start=a, target_start=b, length=c,
                              score=d, cobs=c // 2)
              for (a, b, c, d) in hsps]
        hset = SimpleNamespace(qadv=1, tadv=1, hsps=hl)
        comp = SimpleNamespace(query=qs, target=ts,
                               hspsets=lambda h=hset: [h])
        pair = SDPPair(model, comp, data, None, SdpArgs())
        pair._find_starts()
        pair._find_ends()
        plan = sdp_hybrid.make_plan(model, pair)
        jobs.append((pair, plan))
    return model, jobs


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tlen = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    t0 = time.perf_counter()
    model, jobs = build_pairs(n_pairs, tlen)
    print(f"built {n_pairs} pairs x {tlen} bp in "
          f"{time.perf_counter() - t0:.1f}s; "
          f"W = {[p.W for _, p in jobs]}", flush=True)
    dropoff = jobs[0][0].args.dropoff

    t0 = time.perf_counter()
    out = sdp_pallas.run_kernel(model, jobs, dropoff)
    t_cold = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = sdp_pallas.run_kernel(model, jobs, dropoff)
        times.append(time.perf_counter() - t0)
    best = [int(max(o["band_end"])) for o in out]
    ncells = sum((p.region.query_length + 1) * (pl.W + 1)
                 for p, pl in jobs)
    warm = min(times)
    print(f"kernel: cold {t_cold:.2f}s  warm {warm:.3f}s "
          f"({2 * ncells / warm / 1e9:.2f} G band-cells/s both passes)",
          flush=True)
    print(f"live={[o['live'] for o in out]} best={best}", flush=True)

    # host native comparison on the same pairs
    os.environ.pop("EXONERATE_TPU_SDP", None)
    t0 = time.perf_counter()
    host_best = []
    for pair, _plan in jobs:
        hp = SDPPair(model, pair.comparison, pair.data, None, pair.args)
        hp._find_starts()
        hp._find_ends()
        host_best.append(max((s.max_end.score for s in hp.seeds),
                             default=-1))
    t_host = time.perf_counter() - t0
    print(f"host native find_starts+ends: {t_host:.2f}s  "
          f"best={host_best}", flush=True)


if __name__ == "__main__":
    main()
