"""Memory-bounded bigseq: chromosome-scale exact-word streaming.

The streamed join (seeds/seeder.py bigseq_stream_join) must be
byte-identical to the in-memory path and keep peak RSS bounded by the
--fsmmemory budget at chromosome scale (VERDICT r1 next #6; ref:
src/hub/bsam.c:142-239 linear-memory BSAM/DejaVu)."""
import io
import resource

import numpy as np
import pytest


def _run_cli(argv):
    from exonerate_tpu.cli.exonerate import main
    out = io.StringIO()
    rc = main(argv, out=out)
    assert not rc
    return out.getvalue()


def test_stream_join_matches_in_memory(tmp_path):
    from exonerate_tpu.seqio import Sequence
    from exonerate_tpu.seeds.hsp import HspParam, HspArgs
    from exonerate_tpu.model.match import Match, MatchArgs, MatchType
    from exonerate_tpu.seeds.seeder import (Seeder, SeederArgs,
                                            bigseq_stream_join)
    rng = np.random.default_rng(11)
    q = Sequence("q", None, "".join(rng.choice(list("ACGT"), 20000)))
    tt = list(rng.choice(list("ACGT"), 50000))
    tt[7000:9000] = list(str(q)[3000:5000])
    t = Sequence("t", None, "".join(tt))
    param = HspParam(Match(MatchType.DNA2DNA, MatchArgs()), HspArgs())
    args = SeederArgs()

    # in-memory reference emission
    mem_seeds = []
    params = {"dna": param}
    seeder = Seeder(params, lambda c: None, args, {})
    seeder.add_query(q)
    loader = seeder.loaders["dna"]
    loader.scan_target(t, param.match,
                       lambda ld, qi, qp, tp: mem_seeds.append((qp, tp)))

    for budget in (1 << 20, 16 << 20):
        got = bigseq_stream_join(param, q, t, args, budget)
        assert [tuple(x) for x in got] == mem_seeds, budget


@pytest.mark.slow
def test_bigseq_chromosome_scale_rss(tmp_path):
    """10 Mb x 10 Mb pair under a 256 Mb word budget: completes with
    bounded peak RSS and finds the planted gene."""
    rng = np.random.default_rng(3)
    chrom_a = rng.choice(list("ACGT"), 10_000_000)
    chrom_b = rng.choice(list("ACGT"), 10_000_000)
    gene = rng.choice(list("ACGT"), 5000)
    chrom_a[400_000:405_000] = gene
    chrom_b[7_200_000:7_205_000] = gene
    qf, tf = str(tmp_path / "a.fa"), str(tmp_path / "b.fa")
    with open(qf, "w") as f:
        f.write(">a\n" + "".join(chrom_a) + "\n")
    with open(tf, "w") as f:
        f.write(">b\n" + "".join(chrom_b) + "\n")
    # chromosome-vs-chromosome runs use a strict seed threshold so
    # random 12-mer extensions don't flood the gapped stage (the C
    # reference is equally seed-bound here)
    out = _run_cli(["-m", "affine:local", "--bigseq", "yes",
                    "--bestn", "1", "--revcomp", "no",
                    "--fsmmemory", "256", "--dnahspthreshold", "300",
                    qf, tf, "--showvulgar", "yes",
                    "--showalignment", "no"])
    vulgar = [ln for ln in out.splitlines() if ln.startswith("vulgar:")]
    assert vulgar
    parts = vulgar[0].split()
    score = int(parts[9])
    t0v, t1v = int(parts[6]), int(parts[7])
    # the alignment must cover the planted 5 kb gene copy
    assert score >= 24000, vulgar[0]
    assert t0v <= 7_200_000 and t1v >= 7_205_000, vulgar[0]
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    # word arrays ~160 MB + python/jax baseline; the dict-of-lists path
    # would exceed several GB here
    assert peak_mb < 3000, peak_mb
