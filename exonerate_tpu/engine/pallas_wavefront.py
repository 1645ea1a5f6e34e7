"""Fused Pallas TPU kernel for the anti-diagonal wavefront DP.

The XLA scan engine (wavefront.py) dispatches one fused op-group per
diagonal; at typical pair sizes the per-step dispatch dominates device
time.  This kernel runs the ENTIRE wavefront — all Q+T+1 diagonals over
a batch of pairs — inside one Pallas kernel, with the diagonal carry
ring held in VMEM scratch, so per-diagonal cost is pure VPU arithmetic.

Same cell semantics as wavefront.build_wavefront (ref: Viterbi
interpreted loop, src/c4/viterbi.c:655-837): per-transition source
masking, silent-transition topological order, start/end scope masks,
shadow lanes, first-max-wins with (score desc, j asc, i asc) end-cell
preference.  Modes: "score", "region" and "path" (packed traceback
planes — 4 states' winning-transition ids per int32 lane — emitted to
HBM one diagonal block per grid step, then walked back on-device so
only the op list crosses the host link; the analogue of the
reference's FIND_PATH traceback matrix, ref: viterbi.c:458-460).
SubOpt-blocked re-runs stay on the XLA engine.

Supported input kinds: factored / tvec / qvec / scalar (covers the
est2genome / affine / ner / ungapped model families).  2-D grid calcs
and blocked planes fall back to the XLA engine.

Layout notes (the TPU-first part):
- every per-target vector v is shipped reversed-and-padded so the
  per-diagonal values v[d - i - at] become one contiguous dynamic
  slice rev[Tp - d + at + PADF + i] — no gathers in the kernel;
- the factored match calc table[q_idx[i], t_idx[j]] ships as the
  row-gathered P = table[q_idx] (QV, C) plus the reversed class
  vector; in-kernel the gather becomes a C-way select (the per-batch
  class remap shrinks C to the classes actually present — ~5 for DNA);
- the carry is a (K+1)-slot ring of per-state diagonals in VMEM,
  indexed modulo the ring size, so rotation costs nothing;
- the i axis is padded to a lane multiple (128) and masked by
  ``i <= qlen``, keeping every store tile-aligned.
"""
from __future__ import annotations

import os

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.ir import Model, Protect, Scope
from ..model.ir import model_fingerprint as _mfp
from . import wavefront as wf
from .wavefront import NEG, IMPOSSIBLY_HIGH_SCORE

_INTERPRET = False          # set True in tests to run the kernel on CPU


def _supported(kinds: tuple) -> bool:
    return all(kind in ("factored", "tvec", "qvec", "scalar", "blocked")
               for _k, kind in kinds)


# HBM budget for the device-built skewed SubOpt mask plane; masked jobs
# over this fall back to the XLA engine.  The plane is transient (built,
# streamed one diagonal block per grid step, freed) and HBM is 16 GB on
# v5e — the old 512 MB cap pushed whole locus batches onto the ~25 s/call
# XLA detour
BLOCKED_SKEW_BYTES = 4 << 30


def _shadows_supported(model, inputs: dict) -> bool:
    """Shadow calc inputs must be scalars UNLESS the calc ships a
    gather-free pallas_fn (packed split-codon lanes, model/phase.py);
    otherwise the shadow_fn gathers by position and stays on the XLA
    engine."""
    for k, v in inputs.items():
        if k.startswith("sh") and not k.startswith("shv") \
                and isinstance(v, dict):
            ci = int(k[2:])
            if model.calcs[ci].pallas_fn is not None:
                continue
            for x in v.values():
                if np.ndim(x) != 0:
                    return False
    return True


def _scope_mask_start(scope, si, sj):
    if scope == Scope.ANYWHERE:
        return jnp.bool_(True)
    if scope == Scope.CORNER:
        return (si == 0) & (sj == 0)
    if scope == Scope.QUERY:
        return si == 0
    if scope == Scope.TARGET:
        return sj == 0
    return (si == 0) | (sj == 0)     # EDGE


def _scope_mask_end(scope, i, j, qlen, tlen):
    if scope == Scope.ANYWHERE:
        return jnp.bool_(True)
    if scope == Scope.CORNER:
        return (i == qlen) & (j == tlen)
    if scope == Scope.QUERY:
        return i == qlen
    if scope == Scope.TARGET:
        return j == tlen
    return (i == qlen) | (j == tlen)


def _qv(Qp: int) -> int:
    """Lane-aligned width of the i axis."""
    return ((Qp + 1 + 127) // 128) * 128


# ---------------------------------------------------------------------------
# batched input packing
# ---------------------------------------------------------------------------

def _narrow(a: np.ndarray):
    """Pick the narrowest wire encoding for an int32 array: ('i8'/'i16'/
    'i32', None) plain casts, or ('flag', K) when every value is 0 or a
    single out-of-range constant K (the CDS-veto IMPOSSIBLY_LOW planes,
    ref: match.c:276-281) — shipped as an int8 0/1 mask."""
    lo, hi = (int(a.min()), int(a.max())) if a.size else (0, 0)
    if -128 <= lo and hi <= 127:
        return a.astype(np.int8), ("i8", None)
    if -32768 <= lo and hi <= 32767:
        return a.astype(np.int16), ("i16", None)
    nz = a[a != 0]
    if nz.size and bool((nz == nz.flat[0]).all()):
        return (a != 0).astype(np.int8), ("flag", int(nz.flat[0]))
    return a.astype(np.int32), ("i32", None)


def pack_batched_inputs(model: Model, per_pair: list[dict], kinds: tuple,
                        Qp: int, Tp: int):
    """Stack per-pair prepare_inputs() dicts (already padded to Qp/Tp)
    into a COMPACT batched wire format; the kernel wrapper expands it on
    device (flip + front/back pad to the reversed VLEN layout, widen to
    int32) — the per-call host->device link cost dominates dispatch
    through a TPU tunnel, so the wire ships minimum bytes.  Returns
    (arrays: dict, meta: dict) — meta is static (part of the trace key);
    meta["wire"] records each array's encoding + layout.
    """
    B = len(per_pair)
    QV = _qv(Qp)
    arrays: dict = {}
    wire: dict = {}
    meta: dict = {"B": B}

    def pad_i(v, fill=0):
        v = np.asarray(v)
        return np.pad(v, [(0, QV - v.shape[0])] + [(0, 0)] * (v.ndim - 1),
                      constant_values=fill)

    def add(name, a, rev: bool):
        a, enc = _narrow(np.ascontiguousarray(a))
        arrays[name] = a
        wire[name] = (enc, rev)

    for key, kind in kinds:
        if kind == "blocked":
            # packed SubOpt mask bits (B, Qp+1, ceil((Tp+1)/8)); the
            # device unpacks + skews them to per-diagonal planes (the
            # host->device transfer stays tiny and mask growth across
            # Waterman-Eggert iterations reuses the same trace)
            arrays[key] = np.stack([p[key] for p in per_pair])
        elif kind == "factored":
            union = sorted({int(c)
                            for p in per_pair
                            for c in np.unique(p[key]["t_idx"])})
            ncls = max(int(p[key]["table"].shape[1]) for p in per_pair)
            remap = np.zeros(ncls, np.int32)
            for newc, c in enumerate(union):
                remap[c] = newc
            # bucket the class count so batches with/without e.g. N
            # share one trace (each distinct C retraces the kernel's
            # C-way select chain); padded classes select nothing
            C = len(union)
            for rung in (4, 5, 8, 12, 16, 20, 25):
                if C <= rung:
                    C = rung
                    break
            C = min(C, ncls)
            while len(union) < C:
                union.append(union[-1] if union else 0)
            meta[key] = C
            # ambiguous-query override plane: omitted when all-zero
            # (the common clean-sequence case — saves a plane load and
            # a select per diagonal in the kernel)
            has_ov = any(bool(np.any(p[key]["q_override_s"]))
                         for p in per_pair)
            meta[key + ":ov"] = has_ov
            # one (B, QV) plane per class: a lane-minor (B, QV, C)
            # array would force a relayout on every in-kernel slice
            P = np.stack(
                [pad_i(p[key]["table"][p[key]["q_idx_s"]][:, union])
                 for p in per_pair]).astype(np.int32)      # (B, QV, C)
            for c in range(len(union)):
                add(key + f":P{c}", P[:, :, c], rev=False)
            add(key + ":tj",
                np.stack([remap[p[key]["t_idx"]] for p in per_pair]),
                rev=True)                                  # (B, Tp+1)
            if has_ov:
                add(key + ":ov",
                    np.stack([pad_i(p[key]["q_override_s"])
                              for p in per_pair]), rev=False)  # (B, QV)
        elif kind == "tvec":
            add(key, np.stack([p[key] for p in per_pair]), rev=True)
        elif kind == "qvec":
            add(key, np.stack([pad_i(p[key]) for p in per_pair]),
                rev=False)
        elif kind == "scalar":
            arrays[key] = np.asarray(
                [p[key] for p in per_pair], np.int32).reshape(B, 1)
    for k in per_pair[0]:
        if k.startswith("sh") and isinstance(per_pair[0][k], dict):
            ci = int(k[2:])
            if model.calcs[ci].pallas_fn is not None:
                continue           # kernel form replaces the shadow_fn
            for name in per_pair[0][k]:
                arrays[f"{k}/{name}"] = np.asarray(
                    [p[k][name] for p in per_pair],
                    np.int32).reshape(B, 1)
        elif k.startswith("_") and k != "_blocked":
            arrays[k] = np.asarray(
                [p[k] for p in per_pair], np.int32).reshape(B, 1)
    meta["wire"] = tuple(sorted(wire.items()))
    # per-step CALC value bounds (calc arrays only — the g*/shv*/kc*
    # names registered in kinds; not lengths/offsets/shadow metadata):
    # maxpos bounds the score gain of any path step, minneg its loss.
    # Flag-encoded arrays ship as 0/1 masks, so their bound is the wire
    # CONSTANT, not the array max.  Callers pop these before building
    # the trace key — they gate the int16 carry ring (_ring16_ok) and
    # the guard-free arithmetic (_fastneg_ok).
    calc_names = {k for k, kind in kinds if kind != "blocked"}
    maxpos, minneg = 0, 0
    for n, a in arrays.items():
        if not a.size or not (n in calc_names
                              or n.split(":")[0] in calc_names):
            continue
        spec = wire.get(n)
        if spec is not None and spec[0][0] == "flag":
            lo = hi = int(spec[0][1])
            hi = max(hi, 0)
            lo = min(lo, 0)
        else:
            lo, hi = int(a.min()), int(a.max())
        maxpos = max(maxpos, hi)
        minneg = min(minneg, lo)
    meta["maxpos"] = maxpos
    meta["minneg"] = minneg
    return arrays, meta


def _ring16_ok(model: Model, Qp: int, Tp: int, maxpos: int) -> bool:
    """True when the carry ring can be stored as int16 without changing
    any reportable result: the model is local (a 1-step alignment always
    exists, so the best score is > -16000), calcs are plain (no
    shadow_fn/pallas_fn whose outputs the array bound can't see), and
    the max possible score gain of a path suffix is < 16000.  Then every
    cell on a reported best path has exact value > -16000 (stored
    unclamped), any cell clamped/saturated at the int16 floor lies only
    on paths that end below the best, and no score can reach 32767.

    OFF by default: the int16 sentinel compare (`x == int16(-32768)`)
    does not legalize in the current Mosaic (arith.cmpi on i16 vectors
    fails, same family as the known int16 max/select gaps — PLAN.md
    perf notes), so the int16 ring only ever ran in interpret-mode
    tests; on a real chip it aborts the whole pipeline.  Re-enable
    with EXONERATE_TPU_KERNEL_RING16=1 on a Mosaic that legalizes it."""
    if os.environ.get("EXONERATE_TPU_KERNEL_RING16", "0") != "1":
        return False
    if not model.is_local or maxpos * (min(Qp, Tp) + 2) >= 16000:
        return False
    return not any(c.shadow_fn is not None or c.pallas_fn is not None
                   for c in model.calcs)


# liveness threshold for guard-free arithmetic: real end scores exceed
# NEG + FASTNEG_MARGIN, dead-path values provably never reach it
FASTNEG_MARGIN = 1 << 25


def _fastneg_ok(Qp: int, Tp: int, maxpos: int, minneg: int) -> bool:
    """True when per-transition validity guards can be dropped: invalid
    ring lanes reset to NEG at (masked) load; every other "dead" value is
    NEG plus a sum of real per-step calcs along some path.  The gates
    bound that drift so dead values stay inside
    (int32 min, NEG + FASTNEG_MARGIN) — strictly separated from any
    reportable score (real scores >= -(D * maxabs) > NEG + margin) and
    safe from int32 wrap (NEG - D * maxabs - |minneg| > int32 min).
    Shadow/pallas calc outputs are not visible to these array bounds;
    build_pallas_wavefront keeps the full guard on exactly those
    transitions, which also re-pins their dead outputs to NEG."""
    if os.environ.get("EXONERATE_TPU_KERNEL_FASTNEG", "1") == "0":
        return False
    D = Qp + Tp + 1
    maxabs = max(maxpos, -minneg)
    # A path takes at most D advancing steps plus <= 3 silent steps per
    # diagonal (silent chains are acyclic) — so total accumulated calc,
    # in either direction, is bounded by 4 * D * maxabs.
    # Dead ceiling (upward drift must stay below NEG + FASTNEG_MARGIN):
    # bound the positive accumulation with the same x4 silent-step
    # factor.  Wrap floor (downward drift must not pass int32 min, and
    # a legitimate all-negative global score -(4*D*maxabs) must stay
    # above the found threshold NEG + FASTNEG_MARGIN): budget the full
    # 4*D*maxabs swing on the negative side too —
    # |int32 min| - |NEG| = 1159829327 > (1 << 30), and
    # |NEG| - FASTNEG_MARGIN = 954099889 > (1 << 30) - FASTNEG_MARGIN.
    return (maxpos * (D + 2) * 4 < (1 << 24)
            and maxabs <= (1 << 17)
            and 4 * D * maxabs < (1 << 30) - FASTNEG_MARGIN)


# ---------------------------------------------------------------------------
# kernel builder
# ---------------------------------------------------------------------------

def _build_plan(model: Model) -> list:
    """Static per-transition execution plan (model order, minus pure
    start/end bookkeeping transitions)."""
    start_state = model.start_state.state
    end_state = model.end_state.state
    plan = []
    for t in model.transitions:
        if t.input is end_state or t.output is start_state:
            continue
        shadow_starts = model.src_shadows(t.input)
        plan.append(dict(
            t=t,
            is_match=t.is_match,
            key=wf._grid_key(model, t) if t.calc is not None else None,
            shkey=(f"sh{model.calcs.index(t.calc)}"
                   if t.calc is not None and t.calc.shadow_fn is not None
                   and t.calc.pallas_fn is None else None),
            pallas_ci=(model.calcs.index(t.calc)
                       if t.calc is not None
                       and t.calc.pallas_fn is not None else None),
            start_lanes=[(sh.designation, sh.start,
                          (f"shv{model.shadows.index(sh)}"
                           if sh.start_vec_fn is not None else None))
                         for sh in shadow_starts],
            dst_shadows=[(sh.name, sh.designation)
                         for sh in t.dst_shadows],
        ))
    return plan


def _storage_plan(model: Model, plan: list, region_lanes: tuple):
    """VMEM carry-ring storage layout: which states need ring rows and
    which (state, lane) slots are live (see build_pallas_wavefront).
    ``region_lanes`` are the extra lane ids carrying the region start
    (one packed lane, or a (qs, ts) pair, or none for score mode)."""
    start_state = model.start_state.state
    end_state = model.end_state.state
    ring_states = sorted({p["t"].input.id for p in plan
                          if p["t"].advance_query
                          + p["t"].advance_target > 0
                          and p["t"].input is not start_state})
    live = {s.id: set() for s in model.states}
    if region_lanes:
        live[end_state.id] = set(region_lanes)
    changed = True
    while changed:
        changed = False
        for p in plan:
            t = p["t"]
            if t.input is start_state:
                continue
            consumed = ({d for _, d in p["dst_shadows"]}
                        if (p["shkey"] is not None
                            or p["pallas_ci"] is not None) else set())
            set_by = {d for d, _k, _v in p["start_lanes"]}
            need = consumed | (live[t.output.id] - set_by)
            if not need <= live[t.input.id]:
                live[t.input.id] |= need
                changed = True
    lane_slots = sorted((s, ln) for s in ring_states for ln in live[s])
    return ring_states, lane_slots, live


# VMEM budget for the carry-ring scratch; bounds the per-call batch size
RING_VMEM_BYTES = 48 << 20


def max_batch(model: Model, Qp: int, mode: str) -> int:
    """Largest per-kernel batch whose carry ring fits the VMEM budget."""
    plan = _build_plan(model)
    n_shadow = model.total_shadow_designations
    region_lanes = (n_shadow,) if mode == "region" else ()
    ring_states, lane_slots, _ = _storage_plan(model, plan, region_lanes)
    K = max(max((t.advance_query + t.advance_target
                 for t in model.transitions), default=1), 1)
    per_pair = ((max(len(ring_states), 1) + max(len(lane_slots), 1))
                * (K + 1) + (3 if mode == "region" else 2)) \
        * _qv(Qp) * 4
    return max(1, RING_VMEM_BYTES // per_pair)


def _chunk_pow2(items: list, cap: int):
    """Split items into chunks, each padded (by repeating the final
    element) to a power of two — bounding both VMEM and the number of
    distinct traces per (model, bucket).  The chunk size is clamped to a
    power of two <= cap so the PADDED batch never exceeds the VMEM
    budget (a 65..127-job chunk must not become a 128-pair kernel)."""
    if cap >= 2:
        p = 1
        while p * 2 <= cap:
            p *= 2
        cap = p
    chunks = []
    i = 0
    while i < len(items):
        chunk = items[i:i + cap]
        i += len(chunk)
        b = 1
        while b < len(chunk):
            b *= 2
        pad = b - len(chunk)
        chunks.append((chunk, [x for _, x in chunk]
                       + [chunk[-1][1]] * pad))
    return chunks


def build_pallas_wavefront(model: Model, Qp: int, Tp: int, mode: str,
                           kinds: tuple, meta: dict, names: tuple,
                           interpret: bool | None = None,
                           stream: bool = False,
                           shard_mesh=None,
                           ring16: bool = False,
                           fastneg: bool = False):
    """Build fn(flat_arrays) -> {"score": (B,), ...} running the whole
    wavefront in one Pallas kernel.  ``names`` is the sorted flat key
    order of the packed arrays.

    stream=True keeps the reversed target vectors in HBM and DMAs the
    per-diagonal window into a VMEM scratch ring — lifting the target
    length bound from VMEM scale (~50 kb) to HBM scale (the reference's
    chromosome/BSAM workloads, ref: src/hub/bsam.c, fastadb.h:111)."""
    assert mode in ("score", "region", "path")
    assert _supported(kinds)
    if interpret is None:
        interpret = _INTERPRET
    # timing-ablation knobs (tools/kexp.py): produce WRONG results while
    # keeping the kernel's dataflow shape — never set in production
    ablate = frozenset(
        os.environ.get("EXONERATE_TPU_KERNEL_ABLATE", "").split(","))
    want_region = mode == "region"
    want_path = mode == "path"
    S = len(model.states)
    n_shadow = model.total_shadow_designations
    # region-start carry: one packed (qs << 16 | ts) lane when both
    # bucket-relative coords fit 15 bits (halves the dominant lane-plane
    # VMEM traffic: the region lanes propagate through EVERY state of a
    # local model), else a (qs, ts) lane pair
    pack_rs = want_region and Qp < (1 << 15) and Tp < (1 << 15)
    L = n_shadow + (1 if pack_rs else 2 if want_region else 0)
    rs_q, rs_t = n_shadow, n_shadow + (0 if pack_rs else 1)
    start_state = model.start_state.state
    end_state = model.end_state.state
    B = meta["B"]
    # under a mesh, each device runs the kernel on its batch shard (the
    # pod-scale pair scheduler: pure data parallelism over 'dp', no
    # cross-device traffic inside the DP)
    n_shards = 1
    if shard_mesh is not None:
        assert mode in ("score", "region")
        n_shards = int(np.prod(list(shard_mesh.shape.values())))
        assert B % n_shards == 0, (B, n_shards)
        B = B // n_shards
    QV = _qv(Qp)
    D = Qp + Tp + 1
    K = max(max((t.advance_query + t.advance_target
                 for t in model.transitions), default=1), 1)
    R = K + 1                           # carry ring slots
    PADF = QV + 128
    kind_map = dict(kinds)

    has_blocked = "_blocked" in kind_map

    plan = _build_plan(model)

    # -- static storage planning: the carry ring is the kernel's VMEM
    # bandwidth bill (every diagonal reads+writes per-state planes), so
    # store only what later diagonals can read: ring rows exist for
    # inputs of advancing transitions; a lane slot (state, lane) exists
    # iff a fixpoint over the transition graph shows the lane can still
    # be consumed (shadow read, region-start pick at END) before being
    # re-set (shadow start, START-exit region lanes) --
    region_lanes = (((rs_q,) if pack_rs else (rs_q, rs_t))
                    if want_region else ())
    ring_states, lane_slots, live = _storage_plan(model, plan,
                                                  region_lanes)
    if "nolanes" in ablate:
        lane_slots = []
        live = {s.id: set() for s in model.states}
    ring_row = {s: r for r, s in enumerate(ring_states)}
    NR = max(len(ring_states), 1)
    lane_row = {sl: r for r, sl in enumerate(lane_slots)}
    NL = max(len(lane_slots), 1)

    # path mode: 4 states' plan ids (8 bits each) pack into one int32
    # plane; ids must fit 7 bits so lane 3 never sets the sign bit
    n_plan = len(plan)
    assert not want_path or n_plan < 127, n_plan
    P = (S + 3) // 4
    PB = P * B
    PB8 = ((PB + 7) // 8) * 8           # int32 sublane tile multiple

    # diagonals per grid step: amortizes per-step overhead at the cost
    # of kernel body size (compile time scales with G).  Path mode and
    # blocked-plane pipelining assume one diagonal per grid step, so G
    # applies only to plain score/region scans.
    # G=1 measured best on v5e despite the register-reuse traffic
    # savings at G>1 (tools/kexp.py round 2: g1 1.19 ms/pair vs g4
    # 1.93, g2 2.21 — the grouped body's live SSA set defeats Mosaic's
    # scheduling, and g4 compiles in 795 s vs 23 s).  The machinery
    # stays (correct, parity-tested) for future Mosaic versions.
    G = int(os.environ.get("EXONERATE_TPU_KERNEL_G", "1"))
    if mode == "path" or has_blocked or stream or G < 1:
        G = 1
    n_steps = (D + G - 1) // G
    # names carrying a VLEN axis (reversed target vectors): streamed
    # from HBM when stream=True
    stream_names = tuple(
        n for n in names
        if (kind_map.get(n) == "tvec"
            or (n.endswith(":tj")
                and kind_map.get(n[:-3]) == "factored"))) if stream else ()
    W = QV + 256                        # streamed VMEM window width

    # per-lane best planes: score, j, and the region start (packed into
    # one plane when pack_rs)
    NBP = (3 if pack_rs else 4) if want_region else 2

    # -- windowed diagonal ladder: diagonal d only holds valid cells at
    # i in [max(0, d-Tp), min(d, Qp)], so a square pair wastes ~half the
    # full-width lanes in the opening/closing triangles.  Each grid step
    # picks the smallest static width from a x2 ladder that covers its
    # diagonal window.  Out-of-rectangle lanes need no extra masking:
    # logical i < lo has j > Tp >= tlen, i > hi has j < 0 or i > qlen —
    # cell_ok already rejects them (stale ring lanes beyond an earlier
    # diagonal's narrower window are likewise always masked: such a
    # source si exceeds min(d-adv, Qp), which forces sj < 0).
    # Two flavours, measured on v5e at 2175^2:
    # - "dyn" (score mode): windows anywhere via a 128-aligned dynamic
    #   start + 128-lane front-pad frame (logical i at mem i + FO, an
    #   i >= 0 guard for the i_base=0 phase); gains ~20% (1.37 -> 1.10
    #   ms/pair).  With the region lanes' ~26 plane loads/stores per
    #   diagonal the dynamic starts cost more than the skipped triangle
    #   lanes (1.61 -> 2.85) — so dyn is score-only.
    # - "static" (region/path modes): narrow windows only while the
    #   window START is provably 0 (the whole opening phase d <= Tp —
    #   half the diagonals of a square pair); those steps slice every
    #   plane with STATIC starts, so the lane savings come free.  The
    #   closing triangle runs full width.
    # the dynamic window originally regressed region mode (the ~26
    # lane-plane accesses per diagonal made its dynamic starts a net
    # loss, commit fd2a487); after the round-2 op diet it wins there
    # too (tools/kexp.py: 1.14 vs 1.26 ms/pair at 2175^2 B=64), so
    # score AND region default to dyn and only path keeps the static
    # opening ladder (its tb walk-back needs the unshifted frame).
    env_ladder = os.environ.get("EXONERATE_TPU_KERNEL_LADDER", "1")
    ladder = None
    if not has_blocked and not stream and QV >= 512 and env_ladder != "0":
        if mode in ("score", "region") and env_ladder != "static-only":
            ladder = "dyn"
        elif env_ladder != "dyn-only":
            ladder = "static"
    windowed = ladder is not None
    FO = 128 if ladder == "dyn" else 0
    LDIM = QV + FO
    if ladder == "dyn":
        wlast = min(-(-(min(Qp, Tp + G - 1) + 257) // 128) * 128, LDIM)
        WS = []
        w_ = 512
        while w_ < wlast:
            WS.append(w_)
            w_ *= 2
        WS.append(wlast)
    elif ladder == "static":
        WS = []
        w_ = 512
        while w_ < LDIM:
            WS.append(w_)
            w_ *= 2
        WS.append(LDIM)
    else:
        WS = [QV]

    def kernel(*refs):
        in_refs = dict(zip(names, refs[:len(names)]))
        n_best = 5 if want_region else 3
        n_out = n_best + (1 if want_path else 0)
        out_refs = refs[len(names):len(names) + n_out]
        tb_ref = out_refs[n_best] if want_path else None
        scratch = refs[len(names) + n_out:]
        ring, bestp = scratch[0], scratch[1]
        nx = 2
        lanes_ring = None
        if lane_slots:
            lanes_ring = scratch[nx]
            nx += 1
        windows = {}
        if stream_names:
            sems = scratch[nx + len(stream_names)]
            for k, n in enumerate(stream_names):
                windows[n] = scratch[nx + k]
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            ring[...] = jnp.full(ring.shape,
                                 -32768 if ring16 else NEG, ring.dtype)
            bestp[...] = jnp.zeros(bestp.shape, jnp.int32)
            bestp[0] = jnp.full((B, LDIM), NEG, jnp.int32)
            if lane_slots:
                lanes_ring[...] = jnp.zeros(lanes_ring.shape, jnp.int32)

        def _step(wl, i_base):
            # regs[g] = (scores, lanes) planes of diagonal pid*G + g:
            # later diagonals of the SAME grid step read their sources
            # from these SSA values instead of re-loading the VMEM ring
            # (the dominant bandwidth saving of G-grouped steps)
            regs = []
            for _g in range(G):
                d = pid * G + _g
                if stream_names:
                    # base window start for at=0; covers at in [0, 3]
                    # and the roll residue (W - QV = 256 lanes of slack)
                    st_base = Tp - d + PADF
                    st0 = (st_base // 128) * 128
                    cps = []
                    for k, n in enumerate(stream_names):
                        cp = pltpu.make_async_copy(
                            in_refs[n].at[:, pl.ds(st0, W)],
                            windows[n], sems.at[k])
                        cp.start()
                        cps.append(cp)
                    for cp in cps:
                        cp.wait()
                regs.append(_one_diagonal(
                    d, _g, regs, in_refs, windows, ring, bestp,
                    lanes_ring, tb_ref, wl, i_base))

        if not windowed:
            _step(QV, 0)
        elif ladder == "static":
            d0 = pid * G
            hi_u = jnp.minimum(d0 + (G - 1), Qp)
            opening = d0 <= Tp          # window start provably 0
            needed = hi_u + 1
            prev_w = 0
            for wlad in WS:
                if wlad == LDIM:
                    cond = ~opening | (needed > prev_w)
                else:
                    cond = opening & (needed > prev_w) & (needed <= wlad)
                prev_w = wlad

                @pl.when(cond)
                def _run(wlad=wlad):
                    _step(wlad, 0)
        else:
            d0 = pid * G
            hi_u = jnp.minimum(d0 + (G - 1), Qp)
            lo_u = jnp.maximum(d0 - Tp, 0)
            i_blk = lo_u // 128
            needed = hi_u - i_blk * 128 + FO + 1
            prev_w = 0
            for wlad in WS:
                cond = (needed > prev_w) if wlad == WS[-1] \
                    else (needed > prev_w) & (needed <= wlad)
                prev_w = wlad

                @pl.when(cond)
                def _run(wlad=wlad):
                    if wlad == LDIM:
                        # widest branch: static full-width slices (the
                        # dynamic-start window costs more than it saves
                        # once the window is nearly full)
                        _step(LDIM, 0)
                    else:
                        # the trailing *128 keeps the start provably
                        # 128-aligned for Mosaic's dynamic lane slices
                        _step(wlad,
                              jnp.minimum(i_blk,
                                          (LDIM - wlad) // 128) * 128)

        @pl.when(pid == n_steps - 1)
        def _emit():
            # lexicographic winner over lanes: max score, then min j,
            # then min i (= the reference's end-cell preference)
            BIG = jnp.int32(1 << 30)
            sc = bestp[0]
            m = jnp.max(sc, axis=1)                        # (B,)
            tie = sc == m[:, None]
            jb = bestp[1]
            jmin = jnp.min(jnp.where(tie, jb, BIG), axis=1)
            tie2 = tie & (jb == jmin[:, None])
            ii = jax.lax.broadcasted_iota(jnp.int32, (B, LDIM), 1) - FO
            imin = jnp.min(jnp.where(tie2, ii, BIG), axis=1)
            # under fastneg, dead-path values exceed NEG but never the
            # margin threshold; report exactly NEG for no-alignment
            found = m > (NEG + FASTNEG_MARGIN if fastneg else NEG)
            out_refs[0][...] = jnp.where(found, m, NEG)
            out_refs[1][...] = jnp.where(found, imin, 0)
            out_refs[2][...] = jnp.where(found, jmin, 0)
            if want_region:
                bsel = tie2 & (ii == imin[:, None])
                if pack_rs:
                    w = jnp.sum(jnp.where(bsel, bestp[2], 0), axis=1)
                    qs, ts = w >> 16, w & 0xffff
                else:
                    qs = jnp.sum(jnp.where(bsel, bestp[2], 0), axis=1)
                    ts = jnp.sum(jnp.where(bsel, bestp[3], 0), axis=1)
                out_refs[3][...] = jnp.where(found, qs, 0)
                out_refs[4][...] = jnp.where(found, ts, 0)

    def _one_diagonal(d, g_off, regs, in_refs, windows, ring, bestp,
                      lanes_ring, tb_ref, wl, i_base):
        # wl/i_base: static ladder width + traced 128-aligned window
        # start picked per grid step (full width when not windowed).
        # Logical i lives at mem index i + FO; the FO front-pad lanes
        # let q-shifts read across the aligned window start.  All
        # out-of-window/garbage lanes are rejected by cell_ok: logical
        # i < max(0, d-Tp) implies j > Tp >= tlen, i > min(d, Qp)
        # implies j < 0 or i > qlen.
        i = i_base + jax.lax.broadcasted_iota(jnp.int32, (B, wl), 1) - FO
        j = d - i
        qlen = in_refs["_qlen"][...]                      # (B, 1)
        tlen = in_refs["_tlen"][...]
        qstart = in_refs["_qstart"][...]
        tstart = in_refs["_tstart"][...]
        cell_ok = (j >= 0) & (j <= tlen) & (i <= qlen)
        if FO:       # dyn ladder only: logical i < 0 in the front pad
            cell_ok = cell_ok & (i >= 0)
        # SubOpt mask at the DESTINATION cell (ref: viterbi.c:701-704);
        # the skewed plane block for this diagonal arrives pipelined
        blk = (in_refs["_blocked"][0] != 0) if has_blocked else None

        neg_plane = jnp.full((B, wl), NEG, jnp.int32)
        zero_plane = jnp.zeros((B, wl), jnp.int32)

        def iload(ref):
            """Window of an i-axis (B, LDIM) input plane."""
            if windowed:
                return ref[:, pl.ds(i_base, wl)]
            return ref[...]

        def rload(ref, slot, row):
            x = (ref[slot, row, :, pl.ds(i_base, wl)] if windowed
                 else ref[slot, row])
            if ring16 and ref is ring:
                # int16 carry ring: the saturated floor is the dead
                # sentinel (see _ring16_ok for the dominance argument)
                return jnp.where(x == jnp.int16(-32768), NEG,
                                 x.astype(jnp.int32))
            return x

        def rstore(ref, slot, row, v):
            if ring16 and ref is ring:
                v = jnp.clip(v, -32768, 32767).astype(jnp.int16)
            if windowed:
                ref[slot, row, :, pl.ds(i_base, wl)] = v
            else:
                ref[slot, row] = v

        def shift_q(a, aq, fill):
            # valid in the window frame too: consumers sit at mem lanes
            # k >= FO > aq, so the filled front lanes are never read
            if aq == 0:
                return a
            return jnp.concatenate(
                [jnp.full((B, aq), fill, a.dtype), a[:, :-aq]], axis=1)

        def tslice(name, at):
            # value at source column sj = d - i - at for each i.  Mosaic
            # requires 128-aligned dynamic lane slices, so load the
            # aligned window and dynamic-rotate by the residue
            # (tpu.DynamicRotateOp via pltpu.roll).  Dynamic shifts must
            # be non-negative: a negative shift wraps as unsigned modulo
            # the width — rotate right by width-off instead of left by
            # off.
            st = Tp - d + at + PADF + i_base - FO
            if name in windows:
                st0 = ((Tp - d + PADF) // 128) * 128
                off = st - st0               # in [0, 131)
                if "noroll" in ablate:
                    return windows[name][...][:, :QV]
                return pltpu.roll(windows[name][...], W - off,
                                  axis=1)[:, :QV]
            st0 = (st // 128) * 128
            off = st - st0
            w = in_refs[name][:, pl.ds(st0, wl + 128)]
            if "noroll" in ablate:
                return w[:, :wl]
            return pltpu.roll(w, (wl + 128) - off, axis=1)[:, :wl]

        scores = [None] * S
        lanes_c = [[None] * L for _ in range(S)]
        tb_c = [None] * S
        ring_memo: dict = {}    # transitions share (input, adv, aq) reads
        calc_memo: dict = {}    # stereo twins share calc+advances
        mask_memo: dict = {}    # (aq, at) -> source-validity mask
        sisj_memo: dict = {}

        def adv_mask(aq, at):
            m = mask_memo.get((aq, at))
            if m is None:
                m = cell_ok
                if aq:
                    m = (i >= aq) & m
                if at:
                    m = (j >= at) & m
                mask_memo[(aq, at)] = m
            return m

        def si_of(aq):
            if aq not in sisj_memo:
                sisj_memo[aq] = i - aq if aq else i
            return sisj_memo[aq]

        def sj_of(at):
            key = ("t", at)
            if key not in sisj_memo:
                sisj_memo[key] = j - at if at else j
            return sisj_memo[key]

        for plan_id, p in enumerate(plan):
            t = p["t"]
            aq, at = t.advance_query, t.advance_target
            adv = aq + at
            si, sj = si_of(aq), sj_of(at)
            inp, out = t.input, t.output
            src_l = [zero_plane] * L
            guarded = (not fastneg or p["shkey"] is not None
                       or p["pallas_ci"] is not None)
            src_ok = None
            if guarded:
                src_ok = adv_mask(aq, at)
            if inp is start_state:
                smask = adv_mask(aq, at)
                if model.start_state.scope != Scope.ANYWHERE:
                    smask = smask & _scope_mask_start(
                        model.start_state.scope, si, sj)
                if guarded:
                    src_ok = smask
                base = zero_plane
            else:
                if adv == 0:
                    if scores[inp.id] is None:
                        continue
                    # unset cells hold NEG by construction (planes start
                    # at neg_plane; writes are gated), so no is_set mask
                    base = scores[inp.id]
                    src_l = [v if v is not None else zero_plane
                             for v in lanes_c[inp.id]]
                elif (inp.id, adv, aq) in ring_memo:
                    base, src_l = ring_memo[(inp.id, adv, aq)]
                else:
                    src_g = g_off - adv
                    loaded = False
                    if src_g >= 0:
                        # in-register source: computed earlier in this
                        # same grid step, no VMEM ring traffic.  Under
                        # fastneg its invalid cells already hold
                        # dead (< NEG + margin) values, so no re-mask.
                        r_sc, r_ln = regs[src_g]
                        base = (neg_plane if r_sc[inp.id] is None
                                else r_sc[inp.id])
                        if L:
                            src_l = [(zero_plane
                                      if r_ln[inp.id][ln] is None
                                      else r_ln[inp.id][ln])
                                     for ln in range(L)]
                    else:
                        slot = jnp.remainder(d - adv, R)
                        base = (neg_plane if "noring" in ablate
                                else rload(ring, slot,
                                           ring_row[inp.id]))
                        if L:
                            src_l = [
                                (rload(lanes_ring, slot,
                                       lane_row[(inp.id, ln)])
                                 if (inp.id, ln) in lane_row
                                 else zero_plane)
                                for ln in range(L)]
                        loaded = True
                    if aq > 0:
                        base = shift_q(base, aq, NEG)
                        src_l = [shift_q(v, aq, 0) for v in src_l]
                    if fastneg and loaded:
                        # one masked load (in the DEST frame, after the
                        # q-shift) replaces the dropped per-transition
                        # validity guards: stale / out-of-rectangle
                        # ring lanes reset to NEG
                        base = jnp.where(adv_mask(aq, at), base, NEG)
                    ring_memo[(inp.id, adv, aq)] = (base, src_l)
            end_mask = None
            if out is end_state and \
                    model.end_state.scope != Scope.ANYWHERE:
                end_mask = _scope_mask_end(
                    model.end_state.scope, i, j, qlen, tlen)
                if guarded:
                    src_ok = src_ok & end_mask
            if p["is_match"] and blk is not None and guarded:
                src_ok = src_ok & ~blk
            if p["key"] is None or "nocalc" in ablate:
                calc = jnp.zeros((), jnp.int32)
            elif p["key"] in calc_memo:
                calc = calc_memo[p["key"]]
            else:
                kind = kind_map[p["key"]]
                if kind == "factored":
                    C = meta[p["key"]]
                    tj = tslice(p["key"] + ":tj", at)
                    g = jnp.zeros((B, wl), jnp.int32)
                    for c in range(C):
                        g = jnp.where(tj == c,
                                      iload(in_refs[p["key"] + f":P{c}"]),
                                      g)
                    if meta.get(p["key"] + ":ov", True):
                        ov = iload(in_refs[p["key"] + ":ov"])
                        g = jnp.where(ov != 0, ov, g)
                    calc = g
                elif kind == "tvec":
                    calc = tslice(p["key"], at)
                elif kind == "qvec":
                    calc = iload(in_refs[p["key"]])       # pre-shifted
                else:                                     # scalar
                    calc = in_refs[p["key"]][...]         # (B, 1)
                calc_memo[p["key"]] = calc
            if "nocalc" in ablate:
                pass
            elif p["pallas_ci"] is not None:
                svals = {name: src_l[desig]
                         for name, desig in p["dst_shadows"]}
                ci = p["pallas_ci"]

                class _Ctx:
                    xp = jnp
                    grid_val = calc

                    @staticmethod
                    def lane(prefix):
                        for _n, _v in svals.items():
                            if _n.startswith(prefix):
                                return _v
                        raise KeyError(prefix)

                    @staticmethod
                    def tslice(nm, _ci=ci, _at=at):
                        return tslice(f"kc{_ci}:{nm}", _at)

                    @staticmethod
                    def qvec(nm, _ci=ci):
                        return iload(in_refs[f"kc{_ci}:{nm}"])

                calc = t.calc.pallas_fn(_Ctx)
            elif p["shkey"] is not None:
                svals = {name: src_l[desig]
                         for name, desig in p["dst_shadows"]}
                sh_inputs = {
                    n.split("/", 1)[1]: in_refs[n][...]
                    for n in names if n.startswith(p["shkey"] + "/")}
                calc = t.calc.shadow_fn(jnp, calc, svals, sh_inputs,
                                        si + qstart, sj + tstart)
            if not guarded and inp is start_state:
                # guard-free start: the scope/validity mask folds into
                # the value itself (dead = NEG, see _fastneg_ok)
                val = jnp.where(smask, calc, NEG)
            else:
                val = base + calc
            if t.calc is not None:
                if t.calc.protect & Protect.UNDERFLOW:
                    val = jnp.maximum(val, NEG)
                if t.calc.protect & Protect.OVERFLOW:
                    val = jnp.minimum(val, IMPOSSIBLY_HIGH_SCORE)
            if guarded:
                val = jnp.maximum(val, NEG)
                if inp is start_state:
                    val = jnp.where(src_ok, val, NEG)
                else:
                    val = jnp.where(src_ok & (base > NEG), val, NEG)
            else:
                if end_mask is not None:
                    val = jnp.where(end_mask, val, NEG)
                if p["is_match"] and blk is not None:
                    val = jnp.where(blk, NEG, val)
            cur = scores[out.id]
            new_l = None
            if L and live[out.id]:
                new_l = list(src_l)
                for desig, kind, veckey in p["start_lanes"]:
                    if veckey is not None:
                        new_l[desig] = tslice(veckey, at)
                    else:
                        new_l[desig] = (si + qstart if kind == "query_pos"
                                        else sj + tstart)
                if inp is start_state and want_region:
                    if pack_rs:
                        new_l[rs_q] = (si << 16) | (sj & 0xffff)
                    else:
                        new_l[rs_q] = si
                        new_l[rs_t] = sj
            if cur is None and not guarded:
                # first writer of this state: take the value plane
                # whole — no merge against neg_plane needed (dead
                # cells hold dead values below NEG + margin, which is
                # equivalent to NEG under fastneg)
                scores[out.id] = (val if val.ndim
                                  else jnp.broadcast_to(val, (B, wl)))
                if want_path:
                    tb_c[out.id] = jnp.full((B, wl), plan_id + 1,
                                            jnp.int32)
                if new_l is not None:
                    for ln in sorted(live[out.id]):
                        lanes_c[out.id][ln] = new_l[ln]
                continue
            if cur is None:
                cur = neg_plane
            if want_path or (new_l is not None):
                take = val > cur
                scores[out.id] = jnp.where(take, val, cur)
                if want_path:
                    old_tb = (tb_c[out.id] if tb_c[out.id] is not None
                              else zero_plane)
                    tb_c[out.id] = jnp.where(take, plan_id + 1, old_tb)
                if new_l is not None:
                    for ln in sorted(live[out.id]):
                        old = (lanes_c[out.id][ln]
                               if lanes_c[out.id][ln] is not None
                               else zero_plane)
                        lanes_c[out.id][ln] = jnp.where(
                            take, new_l[ln], old)
            else:
                scores[out.id] = jnp.maximum(val, cur)

        if want_path:
            for pi in range(P):
                word = None
                for k4 in range(4):
                    s = pi * 4 + k4
                    if s >= S or tb_c[s] is None:
                        continue
                    part = tb_c[s] if k4 == 0 else (tb_c[s] << (8 * k4))
                    word = part if word is None else (word | part)
                word = word if word is not None else zero_plane
                if windowed:
                    # unwritten lanes beyond the window hold stale HBM
                    # bytes; the walk-back only visits valid cells,
                    # which the window always covers
                    tb_ref[0, pi * B:(pi + 1) * B, pl.ds(i_base, wl)] = \
                        word
                else:
                    tb_ref[0, pi * B:(pi + 1) * B, :] = word

        # end-cell registration: per-LANE running best (score, j[, qs,
        # ts]) planes — replacing the per-diagonal cross-lane argmax with
        # one compare+select; the lexicographic (score desc, j asc,
        # i asc) winner is reduced once in _emit.  Per lane (fixed i) j
        # grows with d, so replace-on-strictly-greater keeps the
        # smallest-j candidate, matching the reference's first-max rule
        # (ref: viterbi.c:778-791).
        if "noend" not in ablate and scores[end_state.id] is not None:
            es = scores[end_state.id]       # NEG where unset/invalid

            def bwin(k):
                return (bestp[k, :, pl.ds(i_base, wl)] if windowed
                        else bestp[k])

            def bput(k, v):
                if windowed:
                    bestp[k, :, pl.ds(i_base, wl)] = v
                else:
                    bestp[k] = v

            cur = bwin(0)
            take_e = es > cur
            bput(0, jnp.where(take_e, es, cur))
            bput(1, jnp.where(take_e, j, bwin(1)))
            if want_region and lanes_c[end_state.id][rs_q] is not None:
                bput(2, jnp.where(take_e,
                                  lanes_c[end_state.id][rs_q], bwin(2)))
                if not pack_rs:
                    bput(3, jnp.where(take_e,
                                      lanes_c[end_state.id][rs_t],
                                      bwin(3)))

        # write the new diagonal into the ring (live slots only); the
        # first G-K diagonals of a grid step are consumed exclusively
        # in-register by later diagonals of the same step, so only the
        # last K need to reach VMEM for the next grid step
        if "nostore" not in ablate and g_off >= G - K:
            slot = jnp.remainder(d, R)
            for s in ring_states:
                rstore(ring, slot, ring_row[s],
                       neg_plane if scores[s] is None else scores[s])
            for (s, ln) in lane_slots:
                v = lanes_c[s][ln] if scores[s] is not None else None
                rstore(lanes_ring, slot, lane_row[(s, ln)],
                       zero_plane if v is None else v)
        # prune the register hand-off to what later diagonals of this
        # grid step can actually read (= the ring row / lane slot sets)
        # so Mosaic's live SSA set stays at ring size
        reg_sc = [scores[s] if s in ring_row else None
                  for s in range(S)]
        reg_ln = [[(lanes_c[s][ln] if ((s, ln) in lane_row
                                       and scores[s] is not None)
                    else None) for ln in range(L)]
                  for s in range(S)]
        return reg_sc, reg_ln

    n_best = 5 if want_region else 3
    scratch_shapes = [pltpu.VMEM((R, NR, B, LDIM),
                                 jnp.int16 if ring16 else jnp.int32),
                      pltpu.VMEM((NBP, B, LDIM), jnp.int32)]
    if lane_slots:
        scratch_shapes.append(pltpu.VMEM((R, NL, B, LDIM), jnp.int32))
    for _n in stream_names:
        scratch_shapes.append(pltpu.VMEM((B, W), jnp.int32))
    if stream_names:
        scratch_shapes.append(
            pltpu.SemaphoreType.DMA((len(stream_names),)))

    def _skew_blocked(packed):
        """(B, Qp+1, TB) packed mask bits -> (D, B, QV) int32 skewed
        plane on device: skew[d, b, i] = blocked[b, i, d - i]."""
        d_col = jnp.arange(n_steps, dtype=jnp.int32)[:, None]
        i_row = jnp.arange(QV, dtype=jnp.int32)[None, :]
        sj = d_col - i_row
        ok = (sj >= 0) & (sj <= Tp) & (i_row <= Qp)
        sjc = jnp.clip(sj, 0, Tp)
        ic = jnp.broadcast_to(jnp.minimum(i_row, Qp), sj.shape)
        byte = packed[:, ic, sjc >> 3]                    # (B, D, QV)
        bit = (byte >> (7 - (sjc & 7)).astype(jnp.uint8)) & 1
        blk = jnp.where(ok[None], bit, 0).astype(jnp.int32)
        return jnp.transpose(blk, (1, 0, 2))

    out_specs = [pl.BlockSpec((B,), lambda d: (0,))
                 for _ in range(n_best)]
    out_shape = [jax.ShapeDtypeStruct((B,), jnp.int32)
                 for _ in range(n_best)]
    if want_path:
        out_specs.append(pl.BlockSpec((1, PB8, QV), lambda d: (d, 0, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((n_steps, PB8, QV), jnp.int32))

    VLEN = PADF + Tp + 1 + QV + 264     # reversed-vector padded length
    wire = dict(meta.get("wire", ()))

    def _expand(name, x):
        """Wire format -> kernel layout: widen to int32 (flag arrays
        rebuild their single constant) and flip+pad 'rev' arrays to the
        reversed VLEN layout — on device, so the host link ships the
        compact form."""
        spec = wire.get(name)
        if spec is None:
            return x
        (enc, const), rev = spec
        if enc == "flag":
            x = jnp.where(x != 0, jnp.int32(const), jnp.int32(0))
        else:
            x = x.astype(jnp.int32)
        if rev:
            x = jnp.flip(x, axis=1)
            x = jnp.pad(x, ((0, 0), (PADF, VLEN - PADF - x.shape[1])))
        elif FO and x.ndim == 2:
            # windowed frame: logical i lives at mem index i + FO
            x = jnp.pad(x, ((0, 0), (FO, 0)))
        return x

    def core(*flat_arrays):
        flat_arrays = tuple(_expand(n, a)
                            for n, a in zip(names, flat_arrays))
        if has_blocked:
            bi = names.index("_blocked")
            flat_arrays = (flat_arrays[:bi]
                           + (_skew_blocked(flat_arrays[bi]),)
                           + flat_arrays[bi + 1:])

        def in_spec(ai, a):
            if names[ai] == "_blocked" and has_blocked:
                return pl.BlockSpec((1, B, QV), lambda d: (d, 0, 0))
            if names[ai] in stream_names:
                return pl.BlockSpec(memory_space=pl.ANY)
            return pl.BlockSpec(a.shape,
                                functools.partial(
                                    lambda nd, _d: (0,) * nd,
                                    len(a.shape)))

        return pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[in_spec(ai, a)
                      for ai, a in enumerate(flat_arrays)],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=int(os.environ.get(
                    "EXONERATE_TPU_KERNEL_VMEM_MB", "100")) << 20),
            interpret=interpret,
        )(*flat_arrays)

    keys = (["score", "query_end", "target_end"]
            + (["query_start", "target_start"] if want_region else [])
            + (["tb"] if want_path else []))

    # stack the per-pair outputs into ONE (n_best, B) array inside the
    # jit: through a TPU tunnel every fetched array costs a full
    # round-trip (~0.2 s), so per-call results must cross as one value
    # (the tb cube stays device-resident for the on-device walk-back)
    def _stacked(vals):
        d = dict(zip(keys, vals))
        stats = jnp.stack([d[k] for k in keys if k != "tb"])
        return ({"out": stats, "tb": d["tb"]} if want_path
                else {"out": stats})

    if shard_mesh is not None:
        from jax.sharding import PartitionSpec as P
        axes = tuple(shard_mesh.shape.keys())
        in_specs_sm = tuple(
            P(axes, None, None) if n == "_blocked"
            else P(axes, None) for n in names)
        smapped = jax.shard_map(core, mesh=shard_mesh,
                                in_specs=in_specs_sm,
                                out_specs=tuple(P(axes) for _ in keys),
                                check_vma=False)

        @jax.jit
        def fn(flat_arrays):
            return _stacked(smapped(*flat_arrays))
    else:
        @jax.jit
        def fn(flat_arrays):
            return _stacked(core(*flat_arrays))

    fn.out_keys = [k for k in keys if k != "tb"]
    return fn


def _flatten(arrays: dict):
    names = tuple(sorted(arrays))
    return [np.asarray(arrays[k]) for k in names], names


# ---------------------------------------------------------------------------
# public batched API (mirrors wavefront.find_region_batched)
# ---------------------------------------------------------------------------

_CACHE: dict = {}

# per-array device-input cache: the pipeline re-dispatches the same pair
# repeatedly (region scan -> path, Waterman-Eggert subopt re-runs with a
# grown _blocked plane, bestn rescans), and through a TPU tunnel the
# host->device re-transfer dominates; content-addressed caching re-ships
# only arrays whose bytes changed
_DEV_CACHE: "dict[tuple, object]" = {}
_DEV_CACHE_BYTES = [0]
DEV_CACHE_LIMIT = 1 << 30
# the pooled result loops dispatch refinement DPs from worker threads;
# the content-addressed caches mutate shared dicts (including an
# eviction sweep that iterates while deleting), so their critical
# sections take this lock
import threading as _threading
_CACHE_LOCK = _threading.RLock()


def _put_cached(flat: list) -> tuple:
    import hashlib
    with _CACHE_LOCK:
        return _put_cached_locked(flat, hashlib)


def _put_cached_locked(flat, hashlib) -> tuple:
    out = []
    miss_np, miss_keys = [], []
    for a in flat:
        a = np.ascontiguousarray(a)
        key = (a.shape, str(a.dtype),
               hashlib.blake2b(a.tobytes(), digest_size=16).digest())
        hit = _DEV_CACHE.get(key)
        if hit is None:
            miss_np.append(a)
            miss_keys.append(key)
        out.append((key, hit))
    if miss_np:
        while _DEV_CACHE and _DEV_CACHE_BYTES[0] > DEV_CACHE_LIMIT:
            k, v = next(iter(_DEV_CACHE.items()))
            _DEV_CACHE_BYTES[0] -= v.nbytes
            del _DEV_CACHE[k]
        put = wf._put(tuple(jnp.asarray(a) for a in miss_np))
        for k, v in zip(miss_keys, put):
            if k not in _DEV_CACHE:
                _DEV_CACHE[k] = v
                _DEV_CACHE_BYTES[0] += v.nbytes
    return tuple(_DEV_CACHE[k] if v is None else v for k, v in out)


# per-pair prepared-input memo, subopt-free jobs only: a SubOpt mask
# mutates in place across Waterman-Eggert generations, so jobs carrying
# one are never memoized at this level (_put_cached's content hash
# still dedupes their unchanged arrays).  Values pin the data object so
# the id() in the key cannot be reused while the entry lives.
_PREP_CACHE: dict = {}
_PREP_ORDER: list = []
PREP_CACHE_ENTRIES = 256


def _prepare_cached(model: Model, region, data, Qp: int, Tp: int):
    key = (id(model), id(data), region.query_start, region.target_start,
           region.query_length, region.target_length, Qp, Tp)
    with _CACHE_LOCK:
        hit = _PREP_CACHE.get(key)
        if hit is not None and hit[0] is data:
            return hit[1], hit[2]
    inputs, kinds = wf.prepare_inputs(model, region, data,
                                      pad_to=(Qp, Tp), for_pallas=True)
    with _CACHE_LOCK:
        if len(_PREP_ORDER) >= PREP_CACHE_ENTRIES:
            _PREP_CACHE.pop(_PREP_ORDER.pop(0), None)
        _PREP_CACHE[key] = (data, inputs, kinds)
        _PREP_ORDER.append(key)
    return inputs, kinds


# batch-level memo over pack->flatten->H2D: when every per-pair dict in
# the chunk came from _prepare_cached (stable ids), a warm re-dispatch
# of the same jobs skips all host assembly and transfer — this was the
# ~0.5 ms/pair serial host cost between the kernel-only and end-to-end
# rates (VERDICT r2 weak #2)
_BATCH_CACHE: dict = {}
_BATCH_ORDER: list = []
BATCH_CACHE_ENTRIES = 64


def _pack_put_cached(model: Model, per_pair: list, kinds: tuple,
                     Qp: int, Tp: int):
    key = (id(model), tuple(map(id, per_pair)), kinds, Qp, Tp)
    with _CACHE_LOCK:
        hit = _BATCH_CACHE.get(key)
        if hit is not None and len(hit[0]) == len(per_pair) \
                and all(a is b for a, b in zip(hit[0], per_pair)):
            return hit[1:]
    arrays, meta = pack_batched_inputs(model, per_pair, kinds, Qp, Tp)
    flat, names = _flatten(arrays)
    maxpos = meta.pop("maxpos", 0)
    minneg = meta.pop("minneg", 0)
    dev = _put_cached(flat)
    with _CACHE_LOCK:
        if len(_BATCH_ORDER) >= BATCH_CACHE_ENTRIES:
            _BATCH_CACHE.pop(_BATCH_ORDER.pop(0), None)
        _BATCH_CACHE[key] = (list(per_pair), names, meta, maxpos,
                             minneg, dev)
        _BATCH_ORDER.append(key)
    return names, meta, maxpos, minneg, dev


# above this many bytes of reversed target vectors per call, stream
# them from HBM instead of holding them in VMEM
STREAM_VMEM_BYTES = 24 << 20


def find_batched(model: Model, jobs: list, mode: str = "region",
                 interpret: bool | None = None,
                 stream: bool | None = None, subopt=None):
    """Pallas-fused batched wavefront over (region, data) jobs.  Returns
    a list of DPResult.  SubOpt masks run in-kernel (device-built skewed
    plane); falls back to the XLA engine when a job needs unsupported
    input kinds (2-D grids) or the mask plane is over budget.  ``subopt``
    may be a single mask or a per-job list (the pooled locus scheduler
    batches jobs from different comparisons, each with its own mask)."""
    from .wavefront import DPResult, find_region_batched
    out = [None] * len(jobs)

    def _sub(n):
        return subopt[n] if isinstance(subopt, (list, tuple)) else subopt

    memo_ok = subopt is None
    buckets: dict = {}
    for n, (region, data) in enumerate(jobs):
        Qp = wf._bucket(region.query_length)
        Tp = wf._bucket(region.target_length)
        if memo_ok:
            inputs, kinds = _prepare_cached(model, region, data, Qp, Tp)
        else:
            inputs, kinds = wf.prepare_inputs(model, region, data,
                                              subopt=_sub(n),
                                              pad_to=(Qp, Tp),
                                              for_pallas=True)
        buckets.setdefault((Qp, Tp, kinds), []).append((n, inputs))
    for (Qp, Tp, kinds), items in buckets.items():
        skew_bytes = ((Qp + Tp + 1) * len(items) * _qv(Qp) * 4
                      if ("_blocked", "blocked") in kinds else 0)
        if not _supported(kinds) \
                or not _shadows_supported(model, items[0][1]) \
                or skew_bytes > BLOCKED_SKEW_BYTES:
            from .. import observe
            if not _supported(kinds):
                reason = "pallas->xla: unsupported input kinds"
            elif not _shadows_supported(model, items[0][1]):
                reason = "pallas->xla: unsupported shadow lanes"
            else:
                reason = (f"pallas->xla: subopt mask plane over budget "
                          f"({skew_bytes >> 20} MB > "
                          f"{BLOCKED_SKEW_BYTES >> 20} MB)")
            observe.count_fallback(reason, len(items))
            observe.count_engine("xla", len(items))
            groups: dict = {}
            for n, _ in items:
                groups.setdefault(id(_sub(n)), []).append(n)
            for ns in groups.values():
                res = find_region_batched(model, [jobs[n] for n in ns],
                                          subopt=_sub(ns[0]))
                for n, r in zip(ns, res):
                    out[n] = r
            continue
        from .. import observe
        observe.count_engine("pallas", len(items))
        cap = max_batch(model, Qp, mode)
        for chunk, per_pair in _chunk_pow2(items, cap):
            if memo_ok:
                names, meta, maxpos, minneg, dev = _pack_put_cached(
                    model, per_pair, kinds, Qp, Tp)
            else:
                arrays, meta = pack_batched_inputs(model, per_pair,
                                                   kinds, Qp, Tp)
                flat, names = _flatten(arrays)
                maxpos = meta.pop("maxpos", 0)
                minneg = meta.pop("minneg", 0)
                dev = _put_cached(flat)
            if stream is None:
                # expanded (reversed+padded, int32) footprint in VMEM
                n_rev = sum(1 for _n, (_enc, rev) in meta["wire"]
                            if rev)
                vlen = 2 * _qv(Qp) + 128 + Tp + 1 + 264
                vbytes = n_rev * len(per_pair) * vlen * 4
                use_stream = vbytes > STREAM_VMEM_BYTES
            else:
                use_stream = stream
            ring16 = _ring16_ok(model, Qp, Tp, maxpos)
            fastneg = _fastneg_ok(Qp, Tp, maxpos, minneg)
            meta_key = tuple(sorted(meta.items()))
            key = (_mfp(model), Qp, Tp, mode, kinds, meta_key, names,
                   bool(interpret), use_stream, ring16, fastneg)
            fn = _CACHE.get(key)
            if fn is None:
                fn = _CACHE[key] = build_pallas_wavefront(
                    model, Qp, Tp, mode, kinds, meta, names,
                    interpret=interpret, stream=use_stream,
                    ring16=ring16, fastneg=fastneg)
            stats = np.asarray(fn(dev)["out"])
            res = dict(zip(fn.out_keys, stats))   # one fetch per call
            zeros = np.zeros(len(per_pair), np.int32)
            for b, (n, _) in enumerate(chunk):
                out[n] = DPResult(
                    score=int(res["score"][b]),
                    query_end=int(res["query_end"][b]),
                    target_end=int(res["target_end"][b]),
                    query_start=int(res.get("query_start", zeros)[b]),
                    target_start=int(res.get("target_start", zeros)[b]))
    return out


def find_batched_sharded(model: Model, jobs: list, mesh,
                         mode: str = "region",
                         interpret: bool | None = None):
    """Pod-scale pair scheduler: the fused wavefront kernel under
    shard_map, pair batch data-parallel over every mesh axis.  Each
    device runs its batch shard with no cross-device traffic inside the
    DP (results merge host-side, exactly like the reference's external
    concat of --querychunkid shards, ref: exonerate.1:177-204).  Jobs
    whose kinds the kernel can't serve fall back to the XLA engine."""
    from .wavefront import DPResult, find_region_batched
    n_dev = int(np.prod(list(mesh.shape.values())))
    out = [None] * len(jobs)
    buckets: dict = {}
    for n, (region, data) in enumerate(jobs):
        Qp = wf._bucket(region.query_length)
        Tp = wf._bucket(region.target_length)
        inputs, kinds = wf.prepare_inputs(model, region, data,
                                          pad_to=(Qp, Tp),
                                          for_pallas=True)
        buckets.setdefault((Qp, Tp, kinds), []).append((n, inputs))
    for (Qp, Tp, kinds), items in buckets.items():
        if not _supported(kinds) \
                or not _shadows_supported(model, items[0][1]):
            res = find_region_batched(model, [jobs[n] for n, _ in items])
            for (n, _), r in zip(items, res):
                out[n] = r
            continue
        cap = max_batch(model, Qp, mode) * n_dev
        for chunk, per_pair in _chunk_pow2(items, cap):
            # pad the shard batch to a device multiple as well
            pad = (-len(per_pair)) % n_dev
            per_pair = per_pair + [per_pair[-1]] * pad
            arrays, meta = pack_batched_inputs(model, per_pair, kinds,
                                               Qp, Tp)
            flat, names = _flatten(arrays)
            maxpos = meta.pop("maxpos", 0)
            minneg = meta.pop("minneg", 0)
            ring16 = _ring16_ok(model, Qp, Tp, maxpos)
            fastneg = _fastneg_ok(Qp, Tp, maxpos, minneg)
            meta_key = tuple(sorted(meta.items()))
            key = (_mfp(model), Qp, Tp, mode, kinds, meta_key, names,
                   bool(interpret), "mesh", id(mesh), ring16, fastneg)
            fn = _CACHE.get(key)
            if fn is None:
                fn = _CACHE[key] = build_pallas_wavefront(
                    model, Qp, Tp, mode, kinds, meta, names,
                    interpret=interpret, stream=False, shard_mesh=mesh,
                    ring16=ring16, fastneg=fastneg)
            stats = np.asarray(
                fn(tuple(jnp.asarray(a) for a in flat))["out"])
            res = dict(zip(fn.out_keys, stats))
            zeros = np.zeros(len(per_pair), np.int32)
            for b, (n, _) in enumerate(chunk):
                out[n] = DPResult(
                    score=int(res["score"][b]),
                    query_end=int(res["query_end"][b]),
                    target_end=int(res["target_end"][b]),
                    query_start=int(res.get("query_start", zeros)[b]),
                    target_start=int(res.get("target_start", zeros)[b]))
    return out


# ---------------------------------------------------------------------------
# path mode: on-device traceback walk over the packed tb cube
# ---------------------------------------------------------------------------

# HBM budget for one bucket's packed traceback cube; larger path DPs
# fall back to the XLA engine's checkpointed recompute (--dpmemory,
# ref: viterbi.c:128-152)
PATH_TB_BYTES = 1 << 30


def _plan_transitions(model: Model) -> list:
    """The kernel's plan order (must match build_pallas_wavefront)."""
    start_state = model.start_state.state
    end_state = model.end_state.state
    return [t for t in model.transitions
            if t.input is not end_state and t.output is not start_state]


def _build_walkback(model: Model, B: int, cap: int):
    """jitted fn(tb, qe, te) -> (ops [B, cap], n_ops, qstart, tstart):
    walk the packed traceback cube backwards from each pair's best end
    cell (ref: Viterbi_Data_create_Alignment, viterbi.c:342-392).  Runs
    on device; only the op-id list is fetched."""
    plan_ts = _plan_transitions(model)
    start_state = model.start_state.state
    end_id = model.end_state.state.id
    AQ = jnp.asarray([0] + [t.advance_query for t in plan_ts], jnp.int32)
    AT = jnp.asarray([0] + [t.advance_target for t in plan_ts], jnp.int32)
    IN = jnp.asarray([0] + [t.input.id for t in plan_ts], jnp.int32)
    FS = jnp.asarray([True] + [t.input is start_state for t in plan_ts],
                     bool)

    def walk_one(tb, qe, te, b):
        def cond(c):
            return ~c[4]

        def body(c):
            k, i, j, s, _done, ops = c
            d = jnp.clip(i + j, 0, tb.shape[0] - 1)
            row = (s // 4) * B + b
            word = tb[d, row, jnp.clip(i, 0, tb.shape[2] - 1)]
            tid = (word >> ((s % 4) * 8)) & 0xFF
            stop = (tid == 0) | (k >= cap)
            ops = ops.at[jnp.minimum(k, cap - 1)].set(
                jnp.where(stop, ops[jnp.minimum(k, cap - 1)], tid))
            k2 = jnp.where(stop, k, k + 1)
            i2 = jnp.where(stop, i, i - AQ[tid])
            j2 = jnp.where(stop, j, j - AT[tid])
            s2 = jnp.where(stop, s, IN[tid])
            done = stop | FS[tid]
            return (k2, i2, j2, s2, done, ops)

        init = (jnp.int32(0), qe, te, jnp.int32(end_id),
                jnp.bool_(False), jnp.zeros((cap,), jnp.int32))
        k, i, j, _s, _done, ops = jax.lax.while_loop(cond, body, init)
        return ops, k, i, j

    @jax.jit
    def walk(tb, qe, te):
        ops, k, i, j = jax.vmap(walk_one, in_axes=(None, 0, 0, 0))(
            tb, qe, te, jnp.arange(B, dtype=jnp.int32))
        # one packed (B, cap+3) array so the host fetch is one
        # tunnel round-trip
        return jnp.concatenate(
            [ops, k[:, None], i[:, None], j[:, None]], axis=1)

    return walk


def find_path_batched(model: Model, jobs: list, subopt=None,
                      interpret: bool | None = None):
    """Full-path DP on the fused kernel.  Returns a list of DPResult
    (with .path) — entries are None for jobs the kernel can't serve
    (unsupported calc kinds, SubOpt-blocked planes, tb cube over the
    HBM budget, or path longer than the walk cap); callers fall back to
    the XLA engine for those."""
    from .wavefront import DPResult
    out = [None] * len(jobs)
    memo_ok = subopt is None
    buckets: dict = {}
    for n, (region, data) in enumerate(jobs):
        sub = subopt[n] if isinstance(subopt, (list, tuple)) else subopt
        Qp = wf._bucket(region.query_length)
        Tp = wf._bucket(region.target_length)
        if memo_ok:
            inputs, kinds = _prepare_cached(model, region, data, Qp, Tp)
        else:
            inputs, kinds = wf.prepare_inputs(model, region, data,
                                              subopt=sub,
                                              pad_to=(Qp, Tp),
                                              for_pallas=True)
        buckets.setdefault((Qp, Tp, kinds), []).append((n, inputs))
    plan_ts = _plan_transitions(model)
    if len(plan_ts) >= 127:
        return out
    for (Qp, Tp, kinds), items in buckets.items():
        if not _supported(kinds) \
                or not _shadows_supported(model, items[0][1]):
            continue
        S = len(model.states)
        QV = _qv(Qp)
        n_steps = Qp + Tp + 1
        P4 = (S + 3) // 4
        tb_cap = PATH_TB_BYTES // max(n_steps * P4 * QV * 4, 1)
        if tb_cap < 1:
            continue
        if ("_blocked", "blocked") in kinds \
                and n_steps * QV * 4 > BLOCKED_SKEW_BYTES:
            continue
        bcap = min(max_batch(model, Qp, "path"), tb_cap,
                   BLOCKED_SKEW_BYTES // (n_steps * QV * 4)
                   if ("_blocked", "blocked") in kinds else 1 << 30)
        for chunk, per_pair in _chunk_pow2(items, bcap):
            B = len(per_pair)
            if memo_ok:
                names, meta, maxpos, minneg, dev = _pack_put_cached(
                    model, per_pair, kinds, Qp, Tp)
            else:
                arrays, meta = pack_batched_inputs(model, per_pair,
                                                   kinds, Qp, Tp)
                flat, names = _flatten(arrays)
                maxpos = meta.pop("maxpos", 0)
                minneg = meta.pop("minneg", 0)
                dev = _put_cached(flat)
            ring16 = _ring16_ok(model, Qp, Tp, maxpos)
            fastneg = _fastneg_ok(Qp, Tp, maxpos, minneg)
            meta_key = tuple(sorted(meta.items()))
            key = (_mfp(model), Qp, Tp, "path", kinds, meta_key, names,
                   bool(interpret), False, ring16, fastneg)
            fn = _CACHE.get(key)
            if fn is None:
                fn = _CACHE[key] = build_pallas_wavefront(
                    model, Qp, Tp, "path", kinds, meta, names,
                    interpret=interpret, stream=False, ring16=ring16,
                    fastneg=fastneg)
            res = fn(dev)
            stats_dev = res["out"]       # (3, B): score, qe, te
            cap = n_steps + 256
            wkey = (_mfp(model), B, cap, "walk")
            walk = _CACHE.get(wkey)
            if walk is None:
                walk = _CACHE[wkey] = _build_walkback(model, B, cap)
            # two fetches per call total: the packed walk result and
            # the stacked stats (each fetch is a tunnel round-trip)
            packed = np.asarray(walk(res["tb"], stats_dev[1],
                                     stats_dev[2]))
            ops = packed[:, :cap]
            n_ops, qs, ts = packed[:, cap], packed[:, cap + 1], \
                packed[:, cap + 2]
            stats = np.asarray(stats_dev)
            score, qe, te = stats[0], stats[1], stats[2]
            for b, (n, _) in enumerate(chunk):
                k = int(n_ops[b])
                if k >= cap:    # walk cap hit: caller falls back
                    continue
                sc = int(score[b])
                if sc <= NEG + (FASTNEG_MARGIN if fastneg else 0):
                    # no alignment found: under fastneg the tb planes
                    # carry first-writer ids even on dead cells, so the
                    # (0,0) walkback would fabricate a path — preserve
                    # the empty-path contract instead
                    r = DPResult(score=NEG, query_end=0, target_end=0,
                                 query_start=0, target_start=0)
                    r.path = []
                    out[n] = r
                    continue
                path = [plan_ts[tid - 1] for tid in ops[b, :k][::-1]]
                r = DPResult(score=sc,
                             query_end=int(qe[b]), target_end=int(te[b]),
                             query_start=int(qs[b]),
                             target_start=int(ts[b]))
                r.path = path
                out[n] = r
    return out
