"""BSDP heuristic tests (--gappedextension no path)."""
import io

import numpy as np
import pytest

from exonerate_tpu.alphabet import Alphabet, AlphabetType
from exonerate_tpu.seqio import Sequence
from exonerate_tpu.model.affine import AffineModelType, affine_create
from exonerate_tpu.model.data import AlignData
from exonerate_tpu.model.match import Match, MatchArgs, MatchType
from exonerate_tpu.seeds.hsp import Comparison, HspArgs, HspParam, HspSet
from exonerate_tpu.engine.subopt import SubOpt
from exonerate_tpu.hub.bsdp import Heuristic, HPair


class _Solver:
    """Thin harness over the faithful HPair/BSDP stack."""

    def __init__(self, model, data, comp, threshold=50):
        heuristic = Heuristic(model, None, data)
        self.subopt = SubOpt()
        self.hpair = HPair(heuristic, self.subopt,
                           len(comp.query), len(comp.target), data)
        for hs in comp.hspsets():
            portal = next(
                pt for pt in model.portals
                if pt.transitions[0].advance_query == hs.qadv
                and pt.transitions[0].advance_target == hs.tadv)
            self.hpair.add_hspset(portal, hs)
        self.hpair.finalise(threshold)

    def next_path(self, threshold):
        a = self.hpair.next_path(threshold)
        if a is not None:
            self.subopt.add_alignment(a)
        return a

rng = np.random.default_rng(3)
DNA = Alphabet(AlphabetType.DNA)


def seeded_set(q, t, param):
    hs = HspSet(q, t, param)
    qs, ts = str(q), str(t)
    words = {}
    for i in range(len(qs) - 11):
        words.setdefault(qs[i:i + 12], []).append(i)
    seeds = []
    for j in range(len(ts) - 11):
        for qp in words.get(ts[j:j + 12], ()):
            seeds.append((qp, j))
    seeds.sort(key=lambda s: s[1])
    hs.seed_batch(seeds)
    return hs


def test_bsdp_single_and_subopt():
    base = "".join(rng.choice(list("ACGT"), 500))
    q = Sequence("q", None, base[100:160] + "TTTTT" + base[200:280], DNA)
    t = Sequence("t", None, base, DNA)
    param = HspParam(Match(MatchType.DNA2DNA, MatchArgs()), HspArgs())
    hs = seeded_set(q, t, param)
    assert len(hs.hsps) == 2
    comp = Comparison(q, t, dna=hs)
    model = affine_create(AffineModelType.LOCAL, AlphabetType.DNA,
                          AlphabetType.DNA)
    data = AlignData(q, t)
    solver = _Solver(model, data, comp)
    a1 = solver.next_path(50)
    a2 = solver.next_path(50)
    a3 = solver.next_path(50)
    assert a1 is not None and a1.is_valid()
    assert a2 is not None and a2.is_valid()
    assert a3 is None
    assert a1.score >= a2.score >= 50


def test_bsdp_joins_close_hsps():
    # two HSPs separated by a small gap within join range must chain
    base = "".join(rng.choice(list("ACGT"), 300))
    # query = target[50:110] + 4 mismatches + target[114:170]
    q_str = base[50:110] + "TTTT" + base[114:170]
    q = Sequence("q", None, q_str, DNA)
    t = Sequence("t", None, base, DNA)
    param = HspParam(Match(MatchType.DNA2DNA, MatchArgs()), HspArgs())
    hs = seeded_set(q, t, param)
    comp = Comparison(q, t, dna=hs)
    model = affine_create(AffineModelType.LOCAL, AlphabetType.DNA,
                          AlphabetType.DNA)
    data = AlignData(q, t)
    solver = _Solver(model, data, comp)
    a1 = solver.next_path(50)
    assert a1 is not None
    # x-drop extension already crosses a 4-mismatch dip, so either a
    # single extended HSP or a BSDP join must cover ~everything
    assert a1.region.query_length >= len(q_str) - 8
    assert a1.is_valid()


def test_bsdp_cli_gappedextension_no():
    import tempfile
    from exonerate_tpu.cli.exonerate import main
    base = "".join(rng.choice(list("ACGT"), 400))
    with tempfile.TemporaryDirectory() as tmp:
        qp = tmp + "/q.fa"
        tp = tmp + "/t.fa"
        open(qp, "w").write(">q\n" + base[80:200] + "\n")
        open(tp, "w").write(">t\n" + base + "\n")
        out = io.StringIO()
        main(["-m", "affine:local", "--gappedextension", "no",
              "--showalignment", "no", "--showvulgar", "yes",
              "--score", "100", qp, tp], out=out)
        lines = [ln for ln in out.getvalue().splitlines()
                 if ln.startswith("vulgar:")]
        assert lines, out.getvalue()
        assert " 600 " in lines[0]  # 120 bases * 5


@pytest.mark.parametrize("seed", [3, 11])
def test_bsdp_native_vs_oracle_fuzz(seed, tmp_path, monkeypatch):
    """Full --gappedextension no runs must be byte-identical whether the
    hook-free sub-DPs use the native dense Viterbi or the NumPy oracle
    (spliced model: exercises terminals, joins, span crossings and the
    path-mode assembly)."""
    from exonerate_tpu.cli.exonerate import main
    r = np.random.default_rng(seed)
    base = "".join(r.choice(list("ACGT"), 900))
    exon1, exon2 = base[100:220], base[300:430]
    intron = "GT" + base[500:570] + "AG"
    qp, tp = tmp_path / "q.fa", tmp_path / "t.fa"
    qp.write_text(">q\n" + exon1 + exon2 + "\n")
    tp.write_text(">t\n" + base[:60] + exon1 + intron + exon2
                  + base[700:] + "\n")
    args = ["-m", "est2genome", "--gappedextension", "no",
            "--showvulgar", "yes", "--showcigar", "yes",
            "--score", "80", str(qp), str(tp)]

    def run():
        out = io.StringIO()
        main(list(args), out=out)
        return out.getvalue()

    native = run()
    monkeypatch.setenv("EXONERATE_TPU_BSDP", "python")
    oracle = run()
    assert native == oracle
    assert "vulgar:" in native
