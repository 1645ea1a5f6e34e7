"""Kernel timing ablations (TPU): where does the per-diagonal time go?

Builds the fused wavefront kernel with EXONERATE_TPU_KERNEL_ABLATE knobs
that strip one cost component at a time (results become WRONG — timing
only) and times each variant on the bench workload (est2genome,
calm.human self-pair, B=64 region scan).

Usage: python tools/kexp.py [variant ...]   (default: a standard sweep)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import exonerate_tpu

exonerate_tpu.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from exonerate_tpu.seqio import iter_fasta  # noqa: E402
from exonerate_tpu.model.est2genome import est2genome_create  # noqa: E402
from exonerate_tpu.model.data import AlignData  # noqa: E402
from exonerate_tpu.engine.region import Region  # noqa: E402
from exonerate_tpu.engine import wavefront as wf  # noqa: E402
from exonerate_tpu.engine import pallas_wavefront as pw  # noqa: E402


def main():
    B = int(os.environ.get("KEXP_B", "64"))
    mode = os.environ.get("KEXP_MODE", "region")
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
    per_pair = [inputs] * B
    arrays, meta = pw.pack_batched_inputs(model, per_pair, kinds, Qp, Tp)
    flat, names = pw._flatten(arrays)
    dev = wf._put(tuple(jnp.asarray(a) for a in flat))
    cells = region.query_length * region.target_length

    ring16 = pw._ring16_ok(model, Qp, Tp, meta.get("maxpos", 0))
    fastneg = pw._fastneg_ok(Qp, Tp, meta.get("maxpos", 0),
                             meta.get("minneg", 0))
    print(f"ring16 gate: {ring16}  fastneg gate: {fastneg}")

    def run(tag, ablate="", g=None, reps=4, m=None, stream=False,
            r16=None, fn_=None):
        os.environ["EXONERATE_TPU_KERNEL_ABLATE"] = ablate
        if g is not None:
            os.environ["EXONERATE_TPU_KERNEL_G"] = str(g)
        fn = pw.build_pallas_wavefront(model, Qp, Tp, m or mode, kinds,
                                       meta, names, stream=stream,
                                       ring16=ring16 if r16 is None
                                       else r16,
                                       fastneg=fastneg
                                       if fn_ is None else fn_)
        t0 = time.perf_counter()
        r = fn(dev)
        s = np.asarray(r["out"])[fn.out_keys.index("score")]
        tc = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(dev)
            np.asarray(r["out"])
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3 / B
        gcups = cells / (ms / 1e3) / 1e9
        print(f"{tag:24s} compile+1 {tc:7.2f}s  min {ms:7.2f} ms/pair  "
              f"{gcups:6.3f} GCUPS  score={s[0]}", flush=True)
        os.environ["EXONERATE_TPU_KERNEL_ABLATE"] = ""

    variants = sys.argv[1:] or [
        "base:g2", "base:g1", "noroll:g2", "nocalc:g2", "nolanes:g2",
        "noring:g2", "nostore:g2", "noend:g2", "score:g2",
        "noend,nostore:g2",
    ]
    for v in variants:
        ab, _, gs = v.partition(":")
        g = int(gs[1:]) if gs.startswith("g") else None
        if ab == "base":
            run(v, "", g=g)
        elif ab == "stream":
            run(v, "", g=g, stream=True)
        elif ab == "score":
            run(v, "", g=g, m="score")
        elif ab == "ring32":
            run(v, "", g=g, r16=False)
        elif ab == "nofastneg":
            run(v, "", g=g, fn_=False)
        elif ab == "scorefast":
            run(v, "", g=g, m="score", fn_=True)
        elif ab == "dynall":
            # "dyn-only" is the token the kernel recognizes: it drops
            # the static fallback so every mode takes the dyn ladder
            os.environ["EXONERATE_TPU_KERNEL_LADDER"] = "dyn-only"
            run(v, "", g=g)
            os.environ["EXONERATE_TPU_KERNEL_LADDER"] = "1"
        elif ab == "noladder":
            os.environ["EXONERATE_TPU_KERNEL_LADDER"] = "0"
            run(v, "", g=g)
            os.environ["EXONERATE_TPU_KERNEL_LADDER"] = "1"
        else:
            run(v, ab, g=g)


if __name__ == "__main__":
    main()
