"""Waterman-Eggert suboptimal-alignment masking.

TPU-native equivalent of the reference SubOpt (ref: src/c4/subopt.{h,c}):
match positions of prior alignments block match transitions in later DPs.
Positions are stored absolutely; engines ask for a per-row boolean mask in
region-local coordinates (the dense replacement for the reference's
RangeTree + row index).
"""
from __future__ import annotations

from math import gcd

import numpy as np

from ..align.alignment import Alignment
from ..model.ir import Label
from .region import Region


class SubOpt:
    def __init__(self):
        self.points: set[tuple[int, int]] = set()
        self.by_row: dict[int, set[int]] = {}
        self.path_ids: dict[tuple[int, int], int] = {}
        self.path_count = 0

    def add_alignment(self, alignment: Alignment):
        """(ref: SubOpt_add_alignment, subopt.c:126-143)."""
        qp = alignment.region.query_start
        tp = alignment.region.target_start
        for op in alignment.ops:
            t = op.transition
            if t.label == Label.MATCH:
                g = gcd(t.advance_query, t.advance_target)
                q_move = t.advance_query // g
                t_move = t.advance_target // g
                cq, ct = qp, tp
                for _ in range(op.length):
                    q_limit = cq + t.advance_query
                    t_limit = ct + t.advance_target
                    x, y = cq, ct
                    while x < q_limit:
                        self._add(x, y)
                        x += q_move
                        y += t_move
                    cq, ct = q_limit, t_limit
                # block lead-in positions before the run (codon models:
                # the partial diagonal steps entering the first cell;
                # ref: SubOpt_add_AlignmentOperation, subopt.c:100-122)
                x = qp - t.advance_query + q_move
                y = tp - t.advance_target + t_move
                while x < qp:
                    if x >= 0 and y >= 0:
                        self._add(x, y)
                    x += q_move
                    y += t_move
            qp += t.advance_query * op.length
            tp += t.advance_target * op.length
        self.path_count += 1

    def _add(self, q: int, t: int):
        if (q, t) not in self.points:
            self.points.add((q, t))
            self.by_row.setdefault(t, set()).add(q)
            self.path_ids[(q, t)] = self.path_count

    def find(self, region: Region, fn) -> bool:
        """First-match search over stored points inside the half-open
        rectangle (ref: SubOpt_find over RangeTree, subopt.c:166-175;
        RangeTree_inside_rectangle uses [start, start+length) bounds).
        fn(q, t, path_id) -> bool; True stops and is returned."""
        q_lo = region.query_start
        q_hi = region.query_start + region.query_length
        t_lo = region.target_start
        t_hi = region.target_start + region.target_length
        for t in range(t_lo, t_hi):
            row = self.by_row.get(t)
            if not row:
                continue
            for q in sorted(row):
                if q_lo <= q < q_hi and fn(q, t, self.path_ids[(q, t)]):
                    return True
        return False

    def blocked_row(self, region: Region, j_local: int):
        """Boolean mask over region-local query positions for row j."""
        row = self.by_row.get(region.target_start + j_local)
        if not row:
            return None
        mask = np.zeros(region.query_length + 1, dtype=bool)
        for q in row:
            lq = q - region.query_start
            if 0 <= lq <= region.query_length:
                mask[lq] = True
        return mask

    def overlaps_region(self, region: Region) -> bool:
        """True if any blocked point falls inside the region (callers use
        this to know whether a mask-free precomputed DP is still valid)."""
        t_lo = region.target_start
        t_hi = region.target_start + region.target_length
        q_lo = region.query_start
        q_hi = region.query_start + region.query_length
        for t, row in self.by_row.items():
            if t_lo <= t <= t_hi and any(q_lo <= q <= q_hi for q in row):
                return True
        return False

    def blocked_grid(self, region: Region) -> np.ndarray:
        """Full [Q+1, T+1] mask (for the wavefront engine)."""
        mask = np.zeros((region.query_length + 1,
                         region.target_length + 1), dtype=bool)
        for (q, t) in self.points:
            lq, lt = q - region.query_start, t - region.target_start
            if 0 <= lq <= region.query_length \
                    and 0 <= lt <= region.target_length:
                mask[lq, lt] = True
        return mask
