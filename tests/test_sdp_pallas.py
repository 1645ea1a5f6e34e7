"""Differential tests: fused Pallas SDP band-scan kernel vs the XLA
lax.scan expression (engine/sdp_device.py, itself differential-tested
against the Python oracle scheduler).

The kernel (engine/sdp_pallas.py) must reproduce the scan's outputs
exactly on identical (pair, plan) inputs: per-locus best end scores,
the edge-liveness flag, and the cross-locus-thaw flag.  Runs in Pallas
interpret mode on the CPU backend (tests/conftest.py forces cpu).
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
from exonerate_tpu.engine import sdp_bands, sdp_device, sdp_pallas

rng = np.random.default_rng(11)

DD = (AlphabetType.DNA, AlphabetType.DNA)
PD = (AlphabetType.PROTEIN, AlphabetType.DNA)


def _mutate(s, n):
    s = list(s)
    for _ in range(n):
        s[rng.integers(0, len(s))] = "ACGT"[rng.integers(0, 4)]
    return "".join(s)


def _dna(n):
    return "".join("ACGT"[k] for k in rng.integers(0, 4, n))


def _pair_and_plan(mtname, q, t, hsp_list, qadv=1, tadv=1, margin=64,
                   qt=DD):
    os.environ["EXONERATE_TPU_SDP"] = "python"
    model = get_model(ModelType[mtname], *qt)
    assert sdp_device.supported(model), mtname
    qs = Sequence("q", None, q)
    ts = Sequence("t", None, t)
    data = AlignData(qs, ts)
    hl = [SimpleNamespace(query_start=a, target_start=b, length=c,
                          score=d, cobs=c // 2)
          for (a, b, c, d) in hsp_list]
    hs = SimpleNamespace(qadv=qadv, tadv=tadv, hsps=hl)
    comp = SimpleNamespace(query=qs, target=ts, hspsets=lambda: [hs])
    pair = SDPPair(model, comp, data, None, SdpArgs())
    pair._find_starts()
    pair._find_ends()
    extents = [(s.hsp.target_start,
                s.hsp.target_start + s.hsp.length * tadv)
               for s in pair.seeds]
    sw = max((sp.max_target for sp in model.spans), default=0)
    plan = sdp_bands.plan_bands(extents, len(q), len(t), margin=margin,
                                span_window=sw + 2 * margin)
    return model, pair, plan


def _scan_out(model, pair, plan):
    """Reference output via the XLA lax.scan expression."""
    inputs, kinds = sdp_device.prepare_inputs(model, pair, plan)
    inputs.update(sdp_device.prepare_seeds(pair, plan,
                                           len(pair.seeds)))
    fn = sdp_device.get_fn(model, pair.region.query_length, plan.W,
                           kinds, pair.use_boundary, len(pair.seeds),
                           len(plan.loci) + 1, pair.args.dropoff)
    return {k: np.asarray(v) for k, v in fn(inputs).items()}


def _kernel_out(model, pair, plan):
    outs = sdp_pallas.run_kernel(model, [(pair, plan)],
                                 pair.args.dropoff, interpret=True)
    return outs[0]


def _check(mtname, q, t, hsps, **kw):
    model, pair, plan = _pair_and_plan(mtname, q, t, hsps, **kw)
    assert pair.use_boundary, mtname
    n_layers = sdp_pallas.count_seed_layers(pair, plan)
    assert sdp_pallas.kernel_supported(model, pair.use_boundary,
                                       n_layers)
    want = _scan_out(model, pair, plan)
    got = _kernel_out(model, pair, plan)
    n_loci = len(plan.loci)
    assert got["xband"] == bool(want["xband"]), (got["xband"],
                                                 want["xband"])
    assert got["live"] == bool(want["live"]), (got["live"],
                                               want["live"])
    np.testing.assert_array_equal(
        got["band_end"][:n_loci],
        np.asarray(want["band_end"][:n_loci], np.int64))
    return got


def test_est2genome_single_exon_pair():
    cdna = _dna(120)
    t = _dna(200) + cdna + _dna(200)
    q = _mutate(cdna, 6)
    _check("EST2GENOME", q, t, [(30, 230, 40, 60)])


def test_est2genome_two_exons_intron():
    ex1, ex2 = _dna(90), _dna(90)
    intron = "GT" + _dna(96) + "AG"
    t = _dna(100) + ex1 + intron + ex2 + _dna(100)
    q = _mutate(ex1 + ex2, 4)
    _check("EST2GENOME", q, t,
           [(10, 110, 50, 70), (100, 300, 50, 70)])


@pytest.mark.slow
def test_est2genome_two_distant_loci():
    cdna = _dna(100)
    t = _dna(150) + cdna + _dna(5000) + _mutate(cdna, 3) + _dna(150)
    q = _mutate(cdna, 5)
    model, pair, plan = _pair_and_plan(
        "EST2GENOME", q, t, [(20, 170, 40, 55), (20, 5270, 40, 55)])
    got = _check("EST2GENOME", q, t,
                 [(20, 170, 40, 55), (20, 5270, 40, 55)])
    assert len(plan.loci) >= 1


def test_est2genome_seed_layers_same_column():
    cdna = _dna(140)
    t = _dna(100) + cdna + _dna(100)
    q = _mutate(cdna, 4)
    # two seeds with the same target cobs, different query cobs
    _check("EST2GENOME", q, t, [(10, 110, 40, 50), (60, 90, 40, 50)])


_CODON = {"A": "GCT", "C": "TGT", "D": "GAT", "E": "GAA", "F": "TTT",
          "G": "GGT", "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTT",
          "M": "ATG", "N": "AAT", "P": "CCT", "Q": "CAA", "R": "CGT",
          "S": "TCT", "T": "ACT", "V": "GTT", "W": "TGG", "Y": "TAT"}


@pytest.mark.slow
def test_protein2genome_boundary():
    aas = "ACDEFGHIKLMNPQRSTVWY"
    prot = "".join(aas[k] for k in rng.integers(0, 20, 50))
    dna = _dna(60) + "".join(_CODON[ch] for ch in prot) + _dna(60)
    _check("PROTEIN2GENOME", prot, dna, [(5, 75, 30, 80)],
           qadv=1, tadv=3, qt=PD)


@pytest.mark.slow
def test_est2genome_randomized_fuzz():
    for trial in range(4):
        n = int(rng.integers(60, 140))
        cdna = _dna(n)
        t = _dna(int(rng.integers(50, 250))) + cdna \
            + _dna(int(rng.integers(50, 250)))
        q = _mutate(cdna, int(rng.integers(2, 10)))
        hsps = []
        for _ in range(int(rng.integers(1, 4))):
            ln = int(rng.integers(20, max(21, n // 2)))
            qs_ = int(rng.integers(0, max(1, len(q) - ln)))
            ts_ = int(rng.integers(0, max(1, len(t) - ln)))
            hsps.append((qs_, ts_, ln, int(rng.integers(30, 90))))
        _check("EST2GENOME", q, t, hsps)


def test_kernel_mesh_sharded_batch_matches_single():
    """The band-scan kernel under shard_map: comparison batch
    data-parallel over an 8-device CPU mesh, outputs identical to the
    unsharded run (pod-scale scan scheduling, SURVEY §2.13)."""
    import jax
    from jax.sharding import Mesh
    os.environ["EXONERATE_TPU_SDP"] = "python"
    model = get_model(ModelType.EST2GENOME, *DD)
    jobs = []
    for seed in (51, 52, 53):
        r = np.random.default_rng(seed)
        cdna = "".join("ACGT"[k] for k in r.integers(0, 4, 100))
        t = ("".join("ACGT"[k] for k in r.integers(0, 4, 150))
             + cdna
             + "".join("ACGT"[k] for k in r.integers(0, 4, 150)))
        q = list(cdna)
        for _ in range(5):
            q[int(r.integers(0, len(q)))] = "ACGT"[r.integers(0, 4)]
        qs = Sequence("q", None, "".join(q))
        ts = Sequence("t", None, t)
        data = AlignData(qs, ts)
        hl = [SimpleNamespace(query_start=20, target_start=170,
                              length=40, score=60, cobs=20)]
        hs = SimpleNamespace(qadv=1, tadv=1, hsps=hl)
        comp = SimpleNamespace(query=qs, target=ts,
                               hspsets=lambda h=hs: [h])
        pair = SDPPair(model, comp, data, None, SdpArgs())
        pair._find_starts()
        pair._find_ends()
        extents = [(s.hsp.target_start,
                    s.hsp.target_start + s.hsp.length)
                   for s in pair.seeds]
        sw = max((sp.max_target for sp in model.spans), default=0)
        plan = sdp_bands.plan_bands(extents, len(q), len(t),
                                    margin=64, span_window=sw + 128)
        jobs.append((pair, plan))
    single = sdp_pallas.run_kernel(model, jobs, 50, interpret=True)
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs.reshape(8), ("dp",))
    sharded = sdp_pallas.run_kernel(model, jobs, 50, interpret=True,
                                    mesh=mesh)
    for a, b in zip(single, sharded):
        assert a["live"] == b["live"] and a["xband"] == b["xband"]
        np.testing.assert_array_equal(a["band_end"], b["band_end"])


PP = (AlphabetType.PROTEIN, AlphabetType.PROTEIN)
_AAS = list("ACDEFGHIKLMNPQRSTVWY")


def test_ner_joint_span_kernel():
    """ner on the fused kernel: joint span via the lane-shifted curr
    plane + silent span exit via the pre-silent span phase."""
    r = np.random.default_rng(41)
    blockA = "".join(r.choice(_AAS, 60))
    blockB = "".join(r.choice(_AAS, 60))
    q = blockA + "".join(r.choice(_AAS, 25)) + blockB
    t = blockA + "".join(r.choice(_AAS, 40)) + blockB
    _check("NER", q, t, [(5, 5, 40, 220), (95, 110, 40, 220)],
           margin=64, qt=PP)


def test_genome2genome_kernel_gate():
    """genome2genome's joint/query phase calcs carry ARRAY shadow
    inputs (no gather-free kernel form), so the pair-level gate must
    reject the kernel and route to the XLA scan — whose g2g parity is
    covered by test_sdp_device."""
    r = np.random.default_rng(42)
    ex = "".join(r.choice(list("ACGT"), 120))
    genome = ("".join(r.choice(list("ACGT"), 100)) + ex
              + "".join(r.choice(list("ACGT"), 100)))
    model, pair, plan = _pair_and_plan(
        "GENOME2GENOME", ex, genome, [(10, 110, 60, 200)], margin=64)
    n_layers = sdp_pallas.count_seed_layers(pair, plan)
    assert not sdp_pallas.kernel_supported(
        model, pair.use_boundary, n_layers, pair)


def _cross_check(mtname, q, t, hsps, n_chips, **kw):
    model, pair, plan = _pair_and_plan(mtname, q, t, hsps, **kw)
    want = _kernel_out(model, pair, plan)
    got = sdp_pallas.run_kernel_cross_chip(model, pair, plan,
                                           pair.args.dropoff,
                                           n_chips, interpret=True)
    n_loci = len(plan.loci)
    assert got["xband"] == want["xband"]
    assert got["live"] == want["live"]
    np.testing.assert_array_equal(got["band_end"][:n_loci],
                                  want["band_end"][:n_loci])


def test_cross_chip_est2genome_two_chips():
    """ONE pair spanning chips through the band kernel (halo relay of
    edge-column carries + span registers): byte-identical band_end to
    the single-chip kernel with the intron crossing the chip cut."""
    ex1, ex2 = _dna(90), _dna(90)
    intron = "GT" + _dna(96) + "AG"
    t = _dna(100) + ex1 + intron + ex2 + _dna(100)
    q = _mutate(ex1 + ex2, 4)
    _cross_check("EST2GENOME", q, t,
                 [(10, 110, 50, 70), (100, 300, 50, 70)], 2)


@pytest.mark.slow
def test_cross_chip_est2genome_three_chips():
    cdna = _dna(160)
    t = _dna(200) + cdna + _dna(200)
    q = _mutate(cdna, 6)
    _cross_check("EST2GENOME", q, t, [(30, 230, 40, 60)], 3)


@pytest.mark.slow
def test_cross_chip_span_crosses_cut():
    """Intron span frozen in one chunk, thawed in the next: the span
    registers relay across the chip boundary (the kernel image of the
    scheduler's span carry, ref: scheduler.h:111-129)."""
    ex1, ex2 = _dna(80), _dna(80)
    # long intron so the freeze (exon1 end) and thaw (exon2 start)
    # land in different chunks of a 2-way split
    intron = "GT" + _dna(1000) + "AG"
    t = _dna(60) + ex1 + intron + ex2 + _dna(60)
    q = _mutate(ex1 + ex2, 4)
    _cross_check("EST2GENOME", q, t,
                 [(10, 70, 40, 60), (90, 1220, 40, 60)], 2)


@pytest.mark.slow
def test_cross_chip_fuzz():
    for trial in range(3):
        n = int(rng.integers(80, 140))
        cdna = _dna(n)
        t = _dna(int(rng.integers(50, 200))) + cdna \
            + _dna(int(rng.integers(50, 200)))
        q = _mutate(cdna, int(rng.integers(2, 8)))
        mid = len(t) // 2
        _cross_check("EST2GENOME", q, t,
                     [(10, mid - n // 2 + 10, 30, 50)],
                     int(rng.integers(2, 5)))
