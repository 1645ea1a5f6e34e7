"""Cross-check the native C++ seeding machine against the Python HspSet."""
import numpy as np
import pytest

from exonerate_tpu import native
from exonerate_tpu.alphabet import Alphabet, AlphabetType
from exonerate_tpu.model.match import Match, MatchArgs, MatchType
from exonerate_tpu.seeds.hsp import HspArgs, HspParam, HspSet
from exonerate_tpu.seqio import Sequence, iter_fasta

rng = np.random.default_rng(7)


def make_pair(n=400, m=600):
    alpha = Alphabet(AlphabetType.DNA)
    base = "".join(rng.choice(list("ACGT"), m))
    # query: two fragments of the target plus noise
    q = (base[50:150] + "".join(rng.choice(list("ACGT"), 80))
         + base[300:420])
    return (Sequence("q", None, q, alpha),
            Sequence("t", None, base, alpha))


def collect_seeds(query, target, wordlen=12):
    qs = str(query)
    seeds = []
    words = {}
    for i in range(len(qs) - wordlen + 1):
        words.setdefault(qs[i:i + wordlen], []).append(i)
    ts = str(target)
    for j in range(len(ts) - wordlen + 1):
        for qpos in reversed(words.get(ts[j:j + wordlen], ())):
            seeds.append((qpos, j))
    seeds.sort(key=lambda s: s[1])
    return seeds


def test_native_matches_python():
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    q, t = make_pair()
    param = HspParam(Match(MatchType.DNA2DNA, MatchArgs()), HspArgs())
    seeds = collect_seeds(q, t)
    assert seeds
    py = HspSet(q, t, param)
    for s in seeds:
        py.seed(*s)
    py.finalise()
    nat = HspSet(q, t, param)
    nat.seed_batch(seeds)
    got = [(h.query_start, h.target_start, h.length, h.score, h.cobs)
           for h in nat.hsps]
    want = [(h.query_start, h.target_start, h.length, h.score, h.cobs)
            for h in py.hsps]
    assert got == want
    assert want  # found the planted fragments


def test_native_seed_repeat():
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    q, t = make_pair()
    args = HspArgs(seed_repeat=2)
    param = HspParam(Match(MatchType.DNA2DNA, MatchArgs()), args)
    seeds = collect_seeds(q, t)
    py = HspSet(q, t, param)
    for s in seeds:
        py.seed(*s)
    py.finalise()
    nat = HspSet(q, t, param)
    nat.seed_batch(seeds)
    assert ([(h.query_start, h.target_start, h.length, h.score)
             for h in nat.hsps]
            == [(h.query_start, h.target_start, h.length, h.score)
                for h in py.hsps])


def test_calm_selfalign_native():
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    calm = list(iter_fasta(
        "/root/reference/test/data/cdna/calm.human.dna.fasta"))[0]
    calm.strand = "+"
    param = HspParam(Match(MatchType.DNA2DNA, MatchArgs()), HspArgs())
    seeds = collect_seeds(calm, calm)
    hs = HspSet(calm, calm, param)
    hs.seed_batch(seeds)
    assert max(h.score for h in hs.hsps) == 10875
