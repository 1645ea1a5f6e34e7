"""Differential tests: row-scan SDP engine vs the Python oracle.

The q-major row scan (engine/sdp_rows.py) must reproduce the sparse SDP
scheduler's scores exactly: per-locus best end score == max over the
locus's seeds of the oracle SDPPair's max_end.score, and (non-boundary
models) per-seed start scores == the oracle's max_start.score.  Mirrors
tests/test_sdp_device.py so both device tiers cover the same fixtures.
"""
from __future__ import annotations

import os
from types import SimpleNamespace

import numpy as np
import pytest

from exonerate_tpu.alphabet import AlphabetType
from exonerate_tpu.model.registry import ModelType, get_model
from exonerate_tpu.model.data import AlignData
from exonerate_tpu.seqio import Sequence
from exonerate_tpu.engine.sdp import SDPPair, SdpArgs
from exonerate_tpu.engine import sdp_rows, sdp_bands

rng = np.random.default_rng(7)

_slow_mark = pytest.mark.slow

DD = (AlphabetType.DNA, AlphabetType.DNA)
PD = (AlphabetType.PROTEIN, AlphabetType.DNA)


def _mutate(s, n):
    s = list(s)
    for _ in range(n):
        s[rng.integers(0, len(s))] = "ACGT"[rng.integers(0, 4)]
    return "".join(s)


def _run(mtname, q, t, hsp_list, qadv=1, tadv=1, margin=64, qt=DD):
    os.environ["EXONERATE_TPU_SDP"] = "python"
    try:
        model = get_model(ModelType[mtname], *qt)
        assert sdp_rows.supported(model), mtname
        qs = Sequence("q", None, q)
        ts = Sequence("t", None, t)
        data = AlignData(qs, ts)
        hl = [SimpleNamespace(query_start=a, target_start=b, length=c,
                              score=d, cobs=c // 2)
              for (a, b, c, d) in hsp_list]
        hs = SimpleNamespace(qadv=qadv, tadv=tadv, hsps=hl)
        comp = SimpleNamespace(query=qs, target=ts,
                               hspsets=lambda: [hs])
        pair = SDPPair(model, comp, data, None, SdpArgs())
        pair._find_starts()
        pair._find_ends()
        extents = [(s.hsp.target_start,
                    s.hsp.target_start + s.hsp.length * tadv)
                   for s in pair.seeds]
        sw = max((sp.max_target for sp in model.spans), default=0)
        plan = sdp_bands.plan_bands(extents, len(q), len(t),
                                    margin=margin,
                                    span_window=sw + 2 * margin)
        from exonerate_tpu.engine import sdp_device
        inputs, kinds = sdp_device.prepare_inputs(model, pair, plan)
        inputs.update(sdp_device.prepare_seeds(pair, plan,
                                               len(pair.seeds)))
        exts = sdp_rows.chain_ext_values(model, pair)
        fn = sdp_rows.get_fn(model, pair.region.query_length, plan.W,
                             kinds, pair.use_boundary,
                             len(pair.seeds), len(plan.loci) + 1,
                             pair.args.dropoff, exts)
        out = {k: np.asarray(v) for k, v in fn(inputs).items()}
        assert not out["xband"], "cross-locus thaw must be impossible"
        assert not out["unconverged"], "row fixpoint must converge"
        exp = np.full(len(plan.loci), sdp_rows.NEG, np.int64)
        for lx, lc in enumerate(plan.loci):
            for s in pair.seeds[lc.seed_lo:lc.seed_hi]:
                exp[lx] = max(exp[lx], s.max_end.score)
        got = out["band_end"][:len(plan.loci)]
        if out["live"]:
            # extension escaped the band margin: the production path
            # falls back to the host engine; the device must still
            # never OVERcount
            assert np.all(got <= exp), (got, exp)
        else:
            assert np.array_equal(got, exp), (got, exp)
            if not pair.use_boundary:
                exp_start = np.array([s.max_start.score
                                      for s in pair.seeds])
                got_start = out["start_scores"][:len(pair.seeds)]
                assert np.array_equal(got_start, exp_start), \
                    (got_start, exp_start)
        return out
    finally:
        os.environ.pop("EXONERATE_TPU_SDP", None)


def test_affine_local_single_band():
    base = "".join(rng.choice(list("ACGT"), 400))
    q = base[:200]
    t = _mutate(base[50:350], 20)
    _run("AFFINE_LOCAL", q, t, [(60, 10, 80, 300)])


@_slow_mark
def test_affine_local_two_bands():
    base = "".join(rng.choice(list("ACGT"), 400))
    q = base[:200]
    t = ("".join(rng.choice(list("ACGT"), 500)) + q[:120]
         + "".join(rng.choice(list("ACGT"), 800))
         + _mutate(q[60:200], 10)
         + "".join(rng.choice(list("ACGT"), 400)))
    _run("AFFINE_LOCAL", q, t,
         [(5, 505, 100, 350), (70, 1430, 110, 320)], margin=100)


def _gene():
    ex1 = "".join(rng.choice(list("ACGT"), 150))
    ex2 = "".join(rng.choice(list("ACGT"), 150))
    intr = "GT" + "".join(rng.choice(list("ACGT"), 96)) + "AG"
    return ex1, ex2, intr


def test_est2genome_spliced():
    ex1, ex2, intr = _gene()
    genome = ("".join(rng.choice(list("acgt"), 200)) + ex1 + intr + ex2
              + "".join(rng.choice(list("acgt"), 200))).upper()
    cdna = _mutate(ex1 + ex2, 8)
    _run("EST2GENOME", cdna, genome,
         [(10, 210, 120, 400), (160, 458, 130, 430)], margin=96)


@pytest.mark.slow
def test_est2genome_cross_segment_intron():
    """Exons in separate segments of one locus: the span prefix must
    teleport across the removed gap with absolute window checks."""
    ex1, ex2, _ = _gene()
    genome = (("".join(rng.choice(list("acgt"), 300)) + ex1
               + "".join(rng.choice(list("acgt"), 3000)) + ex2
               + "".join(rng.choice(list("acgt"), 300)))).upper()
    cdna = _mutate(ex1 + ex2, 8)
    _run("EST2GENOME", cdna, genome,
         [(10, 310, 120, 400), (160, 3460, 130, 430)], margin=128)


def test_protein2genome_split_codon():
    from exonerate_tpu.translate import default_code
    ex1, ex2, intr = _gene()
    code = default_code()
    pep = code.translate(
        np.frombuffer((ex1 + ex2).encode(), np.uint8), 1)
    pep = pep.tobytes().decode()[:90]
    genome = ("".join(rng.choice(list("acgt"), 120)) + ex1 + intr + ex2
              + "".join(rng.choice(list("acgt"), 120))).upper()
    _run("PROTEIN2GENOME", pep, genome,
         [(2, 126, 40, 200), (55, 430, 28, 160)],
         qadv=1, tadv=3, margin=80, qt=PD)


@_slow_mark
def test_coding2genome():
    ex1, ex2, intr = _gene()
    genome = ("".join(rng.choice(list("acgt"), 120)) + ex1 + intr + ex2
              + "".join(rng.choice(list("acgt"), 120))).upper()
    cdna = _mutate(ex1 + ex2, 8)[:200]
    _run("CODING2GENOME", cdna, genome, [(5, 125, 60, 260)],
         qadv=3, tadv=3, margin=80)


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(4))
def test_est2genome_fuzz(trial):
    r = np.random.default_rng(100 + trial)
    g = "".join(r.choice(list("ACGT"), 1500))
    qq = _mutate(g[200:400] + g[700:900], 25)
    hl = []
    for _ in range(int(r.integers(1, 4))):
        qs0 = int(r.integers(0, len(qq) - 40))
        ts0 = int(r.integers(0, 1500 - 40))
        hl.append((qs0, ts0, int(r.integers(15, 40)),
                   int(r.integers(80, 300))))
    _run("EST2GENOME", qq, g, hl, margin=int(r.integers(48, 200)))


@_slow_mark
def test_protein2dna_multi_portal_boundary():
    from exonerate_tpu.translate import default_code
    r = np.random.default_rng(21)
    dna = "".join(r.choice(list("ACGT"), 600))
    code = default_code()
    pep = code.translate(
        np.frombuffer(dna[90:390].encode(), np.uint8), 1)
    pep = pep.tobytes().decode().replace("*", "S")
    _run("PROTEIN2DNA", pep, dna, [(5, 105, 30, 180)],
         qadv=1, tadv=3, margin=90, qt=PD)


@_slow_mark
def test_coding2coding_frameshifts():
    r = np.random.default_rng(22)
    base = "".join(r.choice(list("ACGT"), 500))
    q = base[:300]
    t = _mutate(base[40:460], 20)
    _run("CODING2CODING", q, t, [(30, 5, 45, 220)],
         qadv=3, tadv=3, margin=120)


@_slow_mark
def test_cdna2genome():
    ex1, ex2, intr = _gene()
    genome = ("".join(rng.choice(list("acgt"), 120)) + ex1 + intr + ex2
              + "".join(rng.choice(list("acgt"), 120))).upper()
    cdna = _mutate(ex1 + ex2, 8)
    _run("CDNA2GENOME", cdna, genome,
         [(10, 130, 120, 400), (160, 378, 130, 430)], margin=96)


@pytest.mark.slow
@pytest.mark.parametrize("trial", range(3))
def test_protein2genome_fuzz(trial):
    """Short-query shape fuzz — the row engine's reason to exist."""
    from exonerate_tpu.translate import default_code
    r = np.random.default_rng(300 + trial)
    code = default_code()
    dna = "".join(r.choice(list("ACGT"), 2000))
    pep = code.translate(
        np.frombuffer(dna[300:600].encode(), np.uint8), 1)
    pep = pep.tobytes().decode().replace("*", "S")
    hl = []
    for _ in range(int(r.integers(1, 3))):
        qs0 = int(r.integers(0, len(pep) - 15))
        ts0 = int(r.integers(0, 2000 - 60))
        hl.append((qs0, ts0, int(r.integers(10, 25)),
                   int(r.integers(80, 250))))
    _run("PROTEIN2GENOME", pep, dna, hl, qadv=1, tadv=3,
         margin=int(r.integers(60, 160)), qt=PD)
