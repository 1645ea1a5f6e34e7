"""Locks for the round-5 parity mechanics that byte-goldens can't cover
cheaply (the forcegtag genome2genome runs take minutes end-to-end):

- C4_Score int32 wrap semantics in the SDP engines: a calc stacking two
  splice-scale penalties must resurrect an IMPOSSIBLY_LOW source past
  INT32_MIN into a large positive score (ref: scheduler.c:1019 with
  gint arithmetic), crediting seed 0 via the memset-zero pmax/seed.
- The percent-threshold arithmetic: gint *= gfloat overflow lands on
  INT_MIN and the threshold falls back to --score
  (ref: gam.c:472-485).
- The libc-qsort seed ordering helper stays consistent for sane scores.
"""
from __future__ import annotations

import numpy as np
import pytest

from exonerate_tpu.engine.sdp import NEG, _qsort_by_score


class _FakeTerminal:
    def __init__(self, score):
        self.score = score


class _FakeSeed:
    def __init__(self, seed_id, score):
        self.seed_id = seed_id
        self.max_end = _FakeTerminal(score)


def test_qsort_by_score_sane_scores_stable_desc():
    seeds = [_FakeSeed(i, s) for i, s in
             enumerate([10, 500, 10, 250, NEG])]
    out = _qsort_by_score(seeds)
    assert [s.max_end.score for s in out] == [500, 250, 10, 10, NEG]
    # stable on ties: the first 10 keeps its position
    assert [s.seed_id for s in out if s.max_end.score == 10] == [0, 2]


def test_qsort_by_score_garbage_uses_libc_comparator():
    # one wrap-positive garbage score among pristine seeds: the
    # comparator b-a overflows int32 and becomes inconsistent; the
    # result must simply be a permutation computed by the REAL libc
    # qsort (same as the reference links), not a well-founded sort
    scores = [1332005653] + [NEG] * 8
    seeds = [_FakeSeed(i, s) for i, s in enumerate(scores)]
    out = _qsort_by_score(seeds)
    assert sorted(s.seed_id for s in out) == list(range(9))
    # glibc's mergesort with this comparator puts a pristine seed
    # first (observed; this is what makes the reference report
    # nothing under genome2genome --forcegtag)
    assert out[0].max_end.score == NEG


def test_wrap_resurrection_matches_reference_arithmetic():
    # NEG + (open + 2 splice penalties) wraps past INT32_MIN into a
    # large positive gint, and the UNDERFLOW clamp (which tests the
    # wrapped value) does NOT fire — the mechanism behind the
    # reference's --forcegtag garbage scores
    pen = -987654336          # float32(-987654321) rounded, per site
    calc = -30 + 2 * pen
    dst = (NEG + calc + 0x80000000 & 0xFFFFFFFF) - 0x80000000
    assert dst == NEG + calc + (1 << 32)
    assert dst > 0            # wrapped positive
    assert not dst < NEG      # clamp misses it
    # a single penalty does NOT wrap (stays a huge negative)
    dst1 = (NEG + (-30 + pen) + 0x80000000 & 0xFFFFFFFF) - 0x80000000
    assert dst1 == NEG + (-30 + pen)
    assert dst1 < 0


def test_percent_threshold_overflow_falls_back_to_score():
    from exonerate_tpu.hub.gam import GAM
    import math
    # replicate query_threshold's arithmetic on a garbage self-score
    th = 5000 + GAM._SELF_OVERRUN_GARBAGE
    v = float(np.float32(np.float32(th) * np.float32(25.0)))
    assert not (-(2.0 ** 31) <= v < 2.0 ** 31)      # overflows
    clamped = -(1 << 31)
    assert math.trunc(clamped / 100) == -21474836   # toward zero
    # ... which is < any sane --score floor, so the threshold falls
    # back to it — the observable reference behavior
    assert math.trunc(clamped / 100) < 100


def test_sane_percent_threshold_float32_path():
    # len % 3 == 0 queries keep a sane self-score: 3750 * 25% = 937
    # (the reference's g2g_small_q probe value)
    import math
    v = float(np.float32(np.float32(3750) * np.float32(25.0)))
    assert math.trunc(int(v) / 100) == 937
