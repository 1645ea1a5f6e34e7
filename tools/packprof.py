"""Profile host-side batched input packing (no TPU needed).

Times prepare_inputs / pack_batched_inputs / flatten+asarray for the
bench workload (est2genome calm self-pair, B=64) to see what share of
find_batched's per-call cost is host packing.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from exonerate_tpu.seqio import iter_fasta  # noqa: E402
from exonerate_tpu.model.est2genome import est2genome_create  # noqa: E402
from exonerate_tpu.model.data import AlignData  # noqa: E402
from exonerate_tpu.engine.region import Region  # noqa: E402
from exonerate_tpu.engine import wavefront as wf  # noqa: E402
from exonerate_tpu.engine import pallas_wavefront as pw  # noqa: E402


def main():
    B = 64
    calm = list(iter_fasta(
        "/root/reference/test/data/cdna/calm.human.dna.fasta"))[0]
    calm.strand = "+"
    model = est2genome_create()
    data = AlignData(calm, calm)
    region = Region(0, 0, len(calm), len(calm))
    Qp = wf._bucket(region.query_length)
    Tp = wf._bucket(region.target_length)

    t0 = time.perf_counter()
    per_pair = []
    kinds = None
    for _ in range(B):
        inputs, kinds = wf.prepare_inputs(model, region, data,
                                          pad_to=(Qp, Tp),
                                          for_pallas=True)
        per_pair.append(inputs)
    t_prep = time.perf_counter() - t0

    t0 = time.perf_counter()
    arrays, meta = pw.pack_batched_inputs(model, per_pair, kinds, Qp, Tp)
    t_pack = time.perf_counter() - t0

    t0 = time.perf_counter()
    flat, names = pw._flatten(arrays)
    flat = [np.ascontiguousarray(a) for a in flat]
    t_flat = time.perf_counter() - t0

    total_mb = sum(a.nbytes for a in flat) / 1e6
    print(f"prepare_inputs x{B}: {t_prep*1e3:8.1f} ms")
    print(f"pack_batched:       {t_pack*1e3:8.1f} ms")
    print(f"flatten:            {t_flat*1e3:8.1f} ms")
    print(f"payload:            {total_mb:8.1f} MB in {len(flat)} arrays")
    for n, a in sorted(zip(names, flat), key=lambda x: -x[1].nbytes)[:8]:
        print(f"  {n:24s} {a.shape} {a.nbytes/1e6:7.2f} MB")


if __name__ == "__main__":
    main()
