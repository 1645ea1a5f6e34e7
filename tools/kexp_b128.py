"""B=128 experiment: does doubling the per-kernel batch (streamed
tvecs, raised ring budget) beat B=64 per-pair on the bench workload?

Usage: python tools/kexp_b128.py [B mode stream ...]
e.g.   python tools/kexp_b128.py 64:region:0 128:region:1 128:score:0
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import exonerate_tpu

exonerate_tpu.enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from exonerate_tpu.seqio import iter_fasta  # noqa: E402
from exonerate_tpu.model.est2genome import est2genome_create  # noqa: E402
from exonerate_tpu.model.data import AlignData  # noqa: E402
from exonerate_tpu.engine.region import Region  # noqa: E402
from exonerate_tpu.engine import wavefront as wf  # noqa: E402
from exonerate_tpu.engine import pallas_wavefront as pw  # noqa: E402


def main():
    calm = list(iter_fasta(
        "/root/reference/test/data/cdna/calm.human.dna.fasta"))[0]
    calm.strand = "+"
    model = est2genome_create()
    data = AlignData(calm, calm)
    region = Region(0, 0, len(calm), len(calm))
    Qp = wf._bucket(region.query_length)
    Tp = wf._bucket(region.target_length)
    inputs, kinds = wf.prepare_inputs(model, region, data,
                                      pad_to=(Qp, Tp), for_pallas=True)
    cells = region.query_length * region.target_length

    variants = sys.argv[1:] or ["64:region:0", "128:region:1"]
    for v in variants:
        bs, mode, st = v.split(":")
        B, stream = int(bs), st == "1"
        per_pair = [inputs] * B
        arrays, meta = pw.pack_batched_inputs(model, per_pair, kinds,
                                              Qp, Tp)
        flat, names = pw._flatten(arrays)
        dev = wf._put(tuple(jnp.asarray(a) for a in flat))
        ring16 = pw._ring16_ok(model, Qp, Tp, meta.pop("maxpos", 0))
        try:
            fn = pw.build_pallas_wavefront(model, Qp, Tp, mode, kinds,
                                           meta, names, stream=stream,
                                           ring16=ring16)
            t0 = time.perf_counter()
            r = fn(dev)
            s = np.asarray(r["out"])[0]
            tc = time.perf_counter() - t0
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(fn(dev)["out"])
                times.append(time.perf_counter() - t0)
            ms = min(times) * 1e3 / B
            gcups = cells / (ms / 1e3) / 1e9
            print(f"{v:18s} compile+1 {tc:7.2f}s  min {ms:7.3f} ms/pair"
                  f"  {gcups:6.3f} GCUPS  score={s[0]}", flush=True)
            assert int(s[0]) == 10875, s
        except Exception as e:  # noqa: BLE001
            print(f"{v:18s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
