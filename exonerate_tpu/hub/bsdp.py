"""BSDP: bounded sparse dynamic programming over the HSP graph.

TPU-native equivalent of the reference's first heuristic
(ref: src/bsdp/bsdp.{h,c}, hpair.{h,c}, sar.{h,c}; selected with
--gappedextension no): HSPs become nodes, terminals and joins become
small bounded DPs on derived sub-models (ref: C4_DerivedModel,
c4.h:337-355), and the best chain through the graph assembles into a full
alignment.  Where the reference confirms edges lazily against admissible
bounds, the bounded DPs here are cheap enough (vectorized small regions)
to confirm eagerly per candidate pair — the graph search stays the same.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ..align.alignment import Alignment
from ..engine.region import Region
from ..engine import reference as ref_engine
from ..model.ir import DerivedModel, Label, Model, Scope
from ..seeds.hsp import Comparison, HSP, HspSet


@dataclass
class HeuristicArgs:
    """(ref: Heuristic_ArgumentSet, heuristic.c:78-96; bsdp.c:25-26)."""
    terminal_range_internal: int = 12
    terminal_range_external: int = 12
    join_range_internal: int = 12
    join_range_external: int = 12
    span_range_internal: int = 12
    span_range_external: int = 12
    join_filter: int = 0


@dataclass
class _Node:
    hsp: HSP
    hspset: HspSet
    q_start: int
    t_start: int
    q_end: int
    t_end: int
    score: int
    start_terminal: Optional[tuple] = None   # (score, Alignment ops info)
    best: int = 0
    best_pred: Optional[int] = None
    best_pred_join: Optional[tuple] = None


class BsdpSolver:
    """Best chain of HSPs with DP-confirmed terminals and joins
    (ref: BSDP_next_path, bsdp.h:163-169; HPair, hpair.h:31-56)."""

    def __init__(self, model: Model, data, comparison: Comparison,
                 args: Optional[HeuristicArgs] = None,
                 max_span_target: int = 200000,
                 max_span_query: int = 0):
        self.model = model
        self.data = data
        self.args = args or HeuristicArgs()
        self.max_span_target = max_span_target
        self.max_span_query = max_span_query
        match_t = model.select_transitions(Label.MATCH)
        # portal state: the match loop state (ref: portal transitions)
        self.match_state = match_t[0].input
        # derived models (ref: Heuristic_Match/Join, heuristic.h:134-168)
        self.start_dm = DerivedModel(
            model, model.start_state.state, self.match_state,
            model.start_state.scope, Scope.CORNER)
        self.end_dm = DerivedModel(
            model, self.match_state, model.end_state.state,
            Scope.CORNER, model.end_state.scope)
        self.join_dm = DerivedModel(
            model, self.match_state, self.match_state,
            Scope.CORNER, Scope.CORNER)
        self.start_model = self.start_dm.derived
        self.end_model = self.end_dm.derived
        self.join_model = self.join_dm.derived
        self.nodes: list[_Node] = []
        for hs in comparison.hspsets():
            for h in hs.hsps:
                self.nodes.append(_Node(
                    h, hs, h.query_start, h.target_start,
                    h.query_end(hs.qadv), h.target_end(hs.tadv),
                    h.score))
        self.nodes.sort(key=lambda n: (n.t_start, n.q_start))
        self.used: set[int] = set()

    # -- bounded component DPs --------------------------------------------

    def _terminal_region(self, node: _Node, is_start: bool) -> Region:
        a = self.args
        qlen = len(self.data.query)
        tlen = len(self.data.target)
        if is_start:
            q_lo = max(0, node.q_start - a.terminal_range_external)
            t_lo = max(0, node.t_start - a.terminal_range_external)
            return Region(q_lo, t_lo, node.q_start - q_lo,
                          node.t_start - t_lo)
        q_hi = min(qlen, node.q_end + a.terminal_range_external)
        t_hi = min(tlen, node.t_end + a.terminal_range_external)
        return Region(node.q_end, node.t_end, q_hi - node.q_end,
                      t_hi - node.t_end)

    def _terminal(self, node: _Node, is_start: bool):
        region = self._terminal_region(node, is_start)
        model = self.start_model if is_start else self.end_model
        try:
            res = ref_engine.viterbi(model, region, self.data, "path")
        except AssertionError:
            return 0, None, region
        return res.score, res, region

    def _join(self, a: _Node, b: _Node):
        """Bounded window DP from a's end to b's start
        (ref: SAR_Join/Span, sar.h:61-135); spans allow intron-scale
        target gaps for genomic models."""
        ja = self.args
        if b.q_start < a.q_end or b.t_start < a.t_end:
            return None
        q_gap = b.q_start - a.q_end
        t_gap = b.t_start - a.t_end
        span_q = self.max_span_query or ja.join_range_internal
        span_t = self.max_span_target or ja.join_range_internal
        if q_gap > max(ja.join_range_internal, span_q):
            return None
        if t_gap > max(ja.join_range_internal, span_t):
            return None
        region = Region(a.q_end, a.t_end, q_gap, t_gap)
        try:
            res = ref_engine.viterbi(self.join_model, region, self.data,
                                     "path")
        except AssertionError:
            return None
        return res.score, res, region

    # -- graph solve -------------------------------------------------------

    def next_path(self, threshold: int) -> Optional[Alignment]:
        nodes = [n for i, n in enumerate(self.nodes)
                 if i not in self.used]
        if not nodes:
            return None
        starts = {}
        ends = {}
        best_final = None
        # forward DP over position-sorted nodes
        for i, b in enumerate(nodes):
            s_score, s_res, s_region = self._terminal(b, True)
            starts[id(b)] = (s_score, s_res, s_region)
            b.best = b.score + s_score
            b.best_pred = None
            b.best_pred_join = None
            for j in range(i):
                a = nodes[j]
                join = self._join(a, b)
                if join is None:
                    continue
                cand = a.best + join[0] + b.score
                if cand > b.best:
                    b.best = cand
                    b.best_pred = j
                    b.best_pred_join = join
        for i, b in enumerate(nodes):
            e_score, e_res, e_region = self._terminal(b, False)
            ends[id(b)] = (e_score, e_res, e_region)
            total = b.best + e_score
            if best_final is None or total > best_final[0]:
                best_final = (total, i)
        if best_final is None or best_final[0] < threshold:
            return None
        # backtrack the chain
        chain = []
        i = best_final[1]
        while i is not None:
            chain.append(nodes[i])
            i = nodes[i].best_pred
        chain.reverse()
        alignment = self._assemble(chain, starts, ends, best_final[0])
        for n in chain:
            self.used.add(self.nodes.index(n))
        return alignment

    def _assemble(self, chain, starts, ends, total_score) -> Alignment:
        """Stitch terminal/HSP/join sub-paths into one alignment
        (ref: HPair_next_path + SAR_Alignment, sar.h:36-59)."""
        first, last = chain[0], chain[-1]
        s_score, s_res, s_region = starts[id(first)]
        e_score, e_res, e_region = ends[id(last)]
        if s_res is not None and s_res.path:
            al_q = s_region.query_start + s_res.query_start
            al_t = s_region.target_start + s_res.target_start
        else:
            al_q, al_t = first.q_start, first.t_start
        # region extent
        if e_res is not None and e_res.path:
            end_q = e_region.query_start + e_res.query_end
            end_t = e_region.target_start + e_res.target_end
        else:
            end_q, end_t = last.q_end, last.t_end
        region = Region(al_q, al_t, end_q - al_q, end_t - al_t)
        alignment = Alignment(self.model, region, total_score)
        tmap_start = self.start_dm.transition_map
        tmap_end = self.end_dm.transition_map
        tmap_join = self.join_dm.transition_map
        if s_res is not None and s_res.path:
            for t in s_res.path:
                alignment.add(tmap_start[id(t)], 1)
        else:
            # silent start -> match link
            for t in self.model.transitions:
                if (t.input is self.model.start_state.state
                        and t.output is self.match_state and t.is_silent):
                    alignment.add(t, 1)
                    break
        match_transition = None
        for n_i, node in enumerate(chain):
            match_transition = self._match_transition(node)
            alignment.add(match_transition, node.hsp.length)
            if n_i + 1 < len(chain):
                nxt = chain[n_i + 1]
                join = nxt.best_pred_join
                if join is not None and join[1].path:
                    for t in join[1].path:
                        alignment.add(tmap_join[id(t)], 1)
        if e_res is not None and e_res.path:
            for t in e_res.path:
                alignment.add(tmap_end[id(t)], 1)
        else:
            for t in self.model.transitions:
                if (t.output is self.model.end_state.state
                        and t.input is self.match_state and t.is_silent):
                    alignment.add(t, 1)
                    break
        return alignment

    def _match_transition(self, node: _Node):
        for t in self.model.select_transitions(Label.MATCH):
            if (t.advance_query == node.hspset.qadv
                    and t.advance_target == node.hspset.tadv):
                return t
        raise ValueError("no match transition for HSP advances")
