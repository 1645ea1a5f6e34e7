"""Golden model scores from the reference test suite (BASELINE.md).

Each test constructs the model through the IR and checks Optimal-find-score
and score/path consistency against the reference cribs
(ref: src/model/affine.test.c:104-107, est2genome.test.c:63, ...).
"""
import numpy as np
import pytest

from exonerate_tpu.alphabet import Alphabet, AlphabetType
from exonerate_tpu.engine.region import Region
from exonerate_tpu.engine import reference as ref_engine
from exonerate_tpu.model.affine import AffineModelType, affine_create
from exonerate_tpu.model.data import AlignData
from exonerate_tpu.model.edit_distance import edit_distance_create
from exonerate_tpu.seqio import Sequence

# ref: src/model/affine.test.c:31-39
AFFINE_QUERY = "MEEPQSDPSVEPPLSQETFSDLWKLL"
AFFINE_TARGET = ("PENNVLSPLPSQAMDDLMLSPDDIEQWFTEDPGP"
                 "EHSCETFDIWKWCPIECDFLNVISEPNEPIPSQ")

AFFINE_CRIBS = [
    (AffineModelType.GLOBAL, -151),
    (AffineModelType.BESTFIT, 18),
    (AffineModelType.LOCAL, 32),
    (AffineModelType.OVERLAP, 18),
]


def protein_pair():
    alpha = Alphabet(AlphabetType.PROTEIN)
    q = Sequence("qy", None, AFFINE_QUERY, alpha)
    t = Sequence("tg", None, AFFINE_TARGET, alpha)
    return q, t


@pytest.mark.parametrize("atype,crib", AFFINE_CRIBS,
                         ids=[a.value for a, _ in AFFINE_CRIBS])
def test_affine_crib(atype, crib):
    q, t = protein_pair()
    model = affine_create(atype, AlphabetType.PROTEIN, AlphabetType.PROTEIN)
    data = AlignData(q, t)
    region = Region(0, 0, len(q), len(t))
    score = ref_engine.find_score(model, region, data)
    assert score == crib
    # score/path consistency (ref: affine.test.c:77-88)
    res = ref_engine.find_path(model, region, data)
    assert res.score == crib
    path_score = _path_score(model, res, region, data)
    assert path_score == crib


def _path_score(model, res, region, data):
    """Re-score the traceback path independently."""
    from exonerate_tpu.engine.reference import _materialize_grids, _grid_value
    grids = _materialize_grids(model, region, data)
    shadow_inputs = {id(c): (c.shadow_inputs_fn(region, data)
                             if c.shadow_inputs_fn else {})
                     for c in model.calcs}
    i, j = res.query_start, res.target_start
    total = 0
    shadow_lanes = {}
    for t in res.path:
        if t.calc is not None:
            val = _grid_value(grids[id(t.calc)], i, j)
            if t.calc.shadow_fn is not None:
                svals = {sh.name: shadow_lanes.get(sh.name, 0)
                         for sh in t.dst_shadows}
                val = int(t.calc.shadow_fn(
                    np, val, svals, shadow_inputs[id(t.calc)],
                    region.query_start + i, region.target_start + j))
            total += val
        for sh in model.src_shadows(t.input):
            shadow_lanes[sh.name] = (region.query_start + i
                                     if sh.start == "query_pos"
                                     else region.target_start + j)
        i += t.advance_query
        j += t.advance_target
    assert (i, j) == (res.query_end, res.target_end)
    return total


def test_edit_distance_crib():
    # ref: src/model/edit_distance.test.c:21-52 (score == -23)
    alpha = Alphabet(AlphabetType.DNA)
    q = Sequence("qy", None,
                 "gtgcactacgtacgtnatcgtgcttnaacgcg"
                 "tacgtgatngtgcttgaacgtacgtacgtgatcg"
                 "tgcttga", alpha)
    t = Sequence("tg", None,
                 "actacgtacgtgatcgtgcaacgcactacg"
                 "tacgtgancttgaacgcactacgtacgtgatcg"
                 "tgcntgaacgn", alpha)
    model = edit_distance_create()
    data = AlignData(q, t)
    region = Region(0, 0, len(q), len(t))
    assert ref_engine.find_score(model, region, data) == -23
    res = ref_engine.find_path(model, region, data)
    assert res.score == -23
