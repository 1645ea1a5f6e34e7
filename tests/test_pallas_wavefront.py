"""Pallas fused-wavefront parity vs the XLA scan engine (interpret mode
runs the kernel on CPU; the TPU path is exercised by bench.py)."""
import numpy as np
import pytest

from exonerate_tpu.seqio import iter_fasta, Sequence
from exonerate_tpu.model.data import AlignData
from exonerate_tpu.engine.region import Region
from exonerate_tpu.engine import wavefront, pallas_wavefront

CALM = "/root/reference/test/data/cdna/calm.human.dna.fasta"


def _calm():
    s = list(iter_fasta(CALM))[0]
    s.strand = "+"
    return s


def test_est2genome_region_parity():
    from exonerate_tpu.model.est2genome import est2genome_create
    calm = _calm()
    model = est2genome_create()
    data = AlignData(calm, calm)
    jobs = [(Region(0, 0, 100, 160), data),
            (Region(40, 10, 80, 150), data),
            (Region(10, 30, 120, 90), data)]
    ref = wavefront.find_region_batched(model, jobs)
    got = pallas_wavefront.find_batched(model, jobs, "region",
                                        interpret=True)
    assert ref == got


def test_est2genome_score_mode():
    from exonerate_tpu.model.est2genome import est2genome_create
    calm = _calm()
    model = est2genome_create()
    data = AlignData(calm, calm)
    jobs = [(Region(0, 0, 90, 140), data)]
    ref = wavefront.find_region_batched(model, jobs)
    got = pallas_wavefront.find_batched(model, jobs, "score",
                                        interpret=True)
    assert got[0].score == ref[0].score
    assert (got[0].query_end, got[0].target_end) == \
        (ref[0].query_end, ref[0].target_end)


def test_affine_local_parity_protein():
    from exonerate_tpu.model.affine import (affine_create,
        AffineModelType)
    from exonerate_tpu.alphabet import AlphabetType
    a = Sequence("a", None, "MKVLAAGICAGWLLWKKMKVL")
    b = Sequence("b", None, "MKVLGAGICAWWLLAKKMK")
    model = affine_create(AffineModelType.LOCAL, AlphabetType.PROTEIN,
                          AlphabetType.PROTEIN)
    data = AlignData(a, b)
    jobs = [(Region(0, 0, len(a), len(b)), data)]
    ref = wavefront.find_region_batched(model, jobs)
    got = pallas_wavefront.find_batched(model, jobs, "region",
                                        interpret=True)
    assert ref == got


def test_optimal_prescan_path_equivalence(monkeypatch):
    """Region pre-scan + path-on-subregion must give the same alignment
    as the direct path DP (ref: Optimal_find_path region-then-path)."""
    from exonerate_tpu.engine import optimal
    from exonerate_tpu.model.est2genome import est2genome_create
    calm = _calm()
    model = est2genome_create()
    sub_q = calm.subseq(100, 300)
    sub_t = calm.subseq(0, 500)
    data = AlignData(sub_q, sub_t)
    region = Region(0, 0, 300, 500)
    direct = optimal.find_path(model, region, data)
    monkeypatch.setattr(optimal, "_FORCE_PRESCAN", True)
    monkeypatch.setattr(optimal, "_PRESCAN_INTERPRET", True)
    scanned = optimal.find_path(model, region, data)
    assert direct is not None and scanned is not None
    assert scanned.score == direct.score
    assert scanned.region.__dict__ == direct.region.__dict__
    assert [(op.transition.name, op.length) for op in scanned.ops] == \
        [(op.transition.name, op.length) for op in direct.ops]


def test_streaming_window_parity():
    """HBM-streamed target windows must match the VMEM-resident path."""
    from exonerate_tpu.model.est2genome import est2genome_create
    calm = _calm()
    model = est2genome_create()
    data = AlignData(calm, calm)
    jobs = [(Region(0, 0, 100, 600), data),
            (Region(30, 5, 90, 580), data)]
    ref = wavefront.find_region_batched(model, jobs)
    got = pallas_wavefront.find_batched(model, jobs, "region",
                                        interpret=True, stream=True)
    assert ref == got


@pytest.mark.parametrize("mtname,S", [
    ("PROTEIN2DNA", 6), ("PROTEIN2GENOME", 13),
    ("CODING2CODING", 7), ("NER", 6),
])
def test_model_family_parity(mtname, S):
    """Codon-advance models exercise K=4/6 carry rings.  Models with
    vector shadow inputs (split-codon phase models) transparently fall
    back to the XLA engine inside find_batched, so parity must hold
    either way."""
    from exonerate_tpu.model.registry import ModelType, get_model
    calm = _calm()
    prot = Sequence("p", None,
                    "MADQLTEEQIAEFKEAFSLFDKDGDGTITTKELGTVMRSL")
    dna = calm.subseq(0, 260)
    mt = getattr(ModelType, mtname)
    q, t = (prot, dna) if mtname.startswith("PROTEIN") else (dna, dna)
    model = get_model(mt, q.alphabet.type, t.alphabet.type)
    assert len(model.states) == S
    data = AlignData(q, t)
    jobs = [(Region(0, 0, len(q), len(t)), data)]
    ref = wavefront.find_region_batched(model, jobs)
    got = pallas_wavefront.find_batched(model, jobs, "region",
                                        interpret=True)
    assert ref == got


@pytest.mark.parametrize("split", [1, 2])
def test_protein2genome_split_codon_kernel(split):
    """Split-codon intron paths (packed-lane kernel form) must score
    identically to the XLA engine, for phase-1 and phase-2 introns."""
    from exonerate_tpu.model.registry import ModelType, get_model
    exon1 = "ATGGCTGACCAGCTGACTGAGCAGATTGCAGAGTTCAA"
    exon2 = "GGGAGGCCTTCTCCCTCTTTGACAAGGATGGAGATGGCACTATTACCACC"
    if split == 2:
        exon1, exon2 = exon1 + "G", exon2[1:]
    prot = Sequence("p", None, "MADQLTEQIAEFKEAFSLFDKDGDGTITT")
    genome = Sequence("g", None,
                      exon1 + "GT" + "N" * 43 + "AG" + exon2)
    model = get_model(ModelType.PROTEIN2GENOME, prot.alphabet.type,
                      genome.alphabet.type)
    data = AlignData(prot, genome)
    jobs = [(Region(0, 0, len(prot), len(genome)), data)]
    ref = wavefront.find_region_batched(model, jobs)
    got = pallas_wavefront.find_batched(model, jobs, "region",
                                        interpret=True)
    assert ref == got
    assert ref[0].score > 100   # the intron path, not a local fragment


def test_pallas_path_mode_parity():
    """Path mode: packed tb planes + on-device walk-back must reproduce
    the XLA engine's alignment exactly (ops, region, score)."""
    from exonerate_tpu.model.est2genome import est2genome_create
    calm = _calm()
    model = est2genome_create()
    data = AlignData(calm, calm)
    jobs = [(Region(0, 0, 100, 160), data),
            (Region(40, 10, 80, 150), data),
            (Region(10, 30, 120, 90), data)]
    got = pallas_wavefront.find_path_batched(model, jobs, interpret=True)
    for (region, d), g in zip(jobs, got):
        ref = wavefront.find_path(model, region, d)
        assert g is not None
        assert (g.score, g.query_start, g.target_start,
                g.query_end, g.target_end) == \
            (ref.score, ref.query_start, ref.target_start,
             ref.query_end, ref.target_end)
        assert [t.name for t in g.path] == [t.name for t in ref.path]


def test_pallas_path_mode_affine():
    from exonerate_tpu.model.affine import affine_create, AffineModelType
    from exonerate_tpu.alphabet import AlphabetType
    a = Sequence("a", None, "MKVLAAGICAGWLLWKKMKVL" * 3)
    b = Sequence("b", None, "MKVLGAGICAWWLLAKKMK" * 3)
    model = affine_create(AffineModelType.LOCAL, AlphabetType.PROTEIN,
                          AlphabetType.PROTEIN)
    data = AlignData(a, b)
    jobs = [(Region(0, 0, len(a), len(b)), data)]
    got = pallas_wavefront.find_path_batched(model, jobs, interpret=True)
    ref = wavefront.find_path(model, jobs[0][0], data)
    assert got[0] is not None and got[0].score == ref.score
    assert [t.name for t in got[0].path] == [t.name for t in ref.path]


@pytest.mark.slow
def test_pallas_blocked_mask_parity():
    """In-kernel SubOpt mask (device-built skewed plane) must match the
    XLA engine for both region and path modes across Waterman-Eggert
    iterations."""
    from exonerate_tpu.engine.subopt import SubOpt
    from exonerate_tpu.engine import optimal
    from exonerate_tpu.model.est2genome import est2genome_create
    calm = _calm()
    model = est2genome_create()
    data = AlignData(calm, calm)
    region = Region(0, 0, 150, 200)
    subopt = SubOpt()
    for it in range(3):
        ref_scan = wavefront.find_region(model, region, data, subopt)
        got_scan = pallas_wavefront.find_batched(
            model, [(region, data)], "region", subopt=subopt,
            interpret=True)[0]
        assert got_scan == ref_scan, f"iteration {it}"
        ref = wavefront.find_path(model, region, data, subopt)
        got = pallas_wavefront.find_path_batched(
            model, [(region, data)], subopt=subopt, interpret=True)[0]
        assert got is not None
        assert (got.score, got.query_start, got.target_start,
                got.query_end, got.target_end) == \
            (ref.score, ref.query_start, ref.target_start,
             ref.query_end, ref.target_end), f"iteration {it}"
        assert [t.name for t in got.path] == \
            [t.name for t in ref.path], f"iteration {it}"
        alignment = optimal._to_alignment(model, region, ref)
        if alignment is None or not alignment.ops:
            break
        subopt.add_alignment(alignment)


def test_sharded_wavefront_parity():
    """The fused kernel under shard_map over an 8-device mesh must match
    the single-device batch (pure dp sharding, host-side merge)."""
    import jax
    from jax.sharding import Mesh
    from exonerate_tpu.model.est2genome import est2genome_create
    calm = _calm()
    model = est2genome_create()
    data = AlignData(calm, calm)
    jobs = [(Region(0, i * 7, 100, 150 + i), data) for i in range(6)]
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("dp", "sp"))
    ref = pallas_wavefront.find_batched(model, jobs, "region",
                                        interpret=True)
    got = pallas_wavefront.find_batched_sharded(model, jobs, mesh,
                                                "region", interpret=True)
    assert got == ref


@pytest.mark.slow
def test_locus_scan_mesh_scheduler(monkeypatch, tmp_path):
    """The GAM locus path routes its batch prescan through the mesh
    scheduler when multiple devices are attached; output must match
    the default (native SDP) path."""
    import io
    import jax
    import numpy as np
    from exonerate_tpu.cli.exonerate import main
    from exonerate_tpu.engine import optimal
    rng = np.random.default_rng(13)
    base = "".join(rng.choice(list("ACGT"), 4000))
    query = base[100:400]
    # nine gene loci so the batch reaches the 8-device mesh scheduler
    parts = []
    for i in range(9):
        parts.append(base[400 + i * 400:400 + i * 400 + 350])
        parts.append(query)
    target = "".join(parts) + base[:400]
    qf, tf = tmp_path / "q.fa", tmp_path / "t.fa"
    qf.write_text(">q\n" + query + "\n")
    tf.write_text(">t\n" + target + "\n")
    args = ["-m", "affine:local", "--showvulgar", "yes",
            "--showalignment", "no", str(qf), str(tf)]

    def run():
        buf = io.StringIO()
        main(list(args), out=buf)
        return buf.getvalue()

    want = run()
    assert len([ln for ln in want.splitlines()
                if ln.startswith("vulgar:")]) >= 2
    assert len(jax.devices()) >= 2  # conftest forces the 8-dev mesh
    monkeypatch.setenv("EXONERATE_TPU_HEURISTIC", "locus")
    monkeypatch.setattr(optimal, "_FORCE_PRESCAN", True)
    monkeypatch.setattr(optimal, "_PRESCAN_INTERPRET", True)
    got = run()

    def scores(text):
        return sorted((int(ln.split()[9]) for ln in text.splitlines()
                       if ln.startswith("vulgar:")), reverse=True)

    # the locus kernel path enumerates suboptimals differently from the
    # byte-parity SDP, but every locus' top alignment must agree
    assert scores(got)[:9] == scores(want)[:9]


def test_static_ladder_region_and_path_parity():
    """Qp bucket 512 -> QV 640 turns the static opening ladder ON for
    region/path modes: opening-phase diagonals run in narrow static
    windows (w=512), the closing triangle full-width.  Parity vs the
    XLA engine across both branch kinds, including the windowed tb
    stores in path mode."""
    from exonerate_tpu.model.est2genome import est2genome_create
    calm = _calm()
    model = est2genome_create()
    data = AlignData(calm, calm)
    region = Region(0, 0, 400, 520)
    ref = wavefront.find_region_batched(model, [(region, data)])
    got = pallas_wavefront.find_batched(model, [(region, data)],
                                        "region", interpret=True)
    assert ref == got
    g = pallas_wavefront.find_path_batched(model, [(region, data)],
                                           interpret=True)[0]
    refp = wavefront.find_path(model, region, data)
    assert g is not None
    assert (g.score, g.query_start, g.target_start,
            g.query_end, g.target_end) == \
        (refp.score, refp.query_start, refp.target_start,
         refp.query_end, refp.target_end)
    assert [t.name for t in g.path] == [t.name for t in refp.path]


def test_grouped_steps_and_guarded_parity(monkeypatch):
    """G=4 grid steps exercise the cross-diagonal register-reuse path
    (sources read from in-step SSA values, ring stores skipped for the
    first G-K diagonals); EXONERATE_TPU_KERNEL_FASTNEG=0 exercises the
    fully-guarded arithmetic.  Both must match the XLA engine,
    including on the static opening ladder (bucket 512)."""
    from exonerate_tpu.model.est2genome import est2genome_create
    calm = _calm()
    model = est2genome_create()
    data = AlignData(calm, calm)
    jobs = [(Region(0, 0, 400, 520), data),
            (Region(40, 10, 80, 150), data)]
    ref = wavefront.find_region_batched(model, jobs)
    for g, fneg in (("4", "1"), ("2", "0")):
        monkeypatch.setenv("EXONERATE_TPU_KERNEL_G", g)
        monkeypatch.setenv("EXONERATE_TPU_KERNEL_FASTNEG", fneg)
        pallas_wavefront._CACHE.clear()
        got = pallas_wavefront.find_batched(model, jobs, "region",
                                            interpret=True)
        assert ref == got, (g, fneg)
    pallas_wavefront._CACHE.clear()
