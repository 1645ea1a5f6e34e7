"""Pallas-fused SDP band scan: the default heuristic's DP in ONE kernel.

(ref: src/sdp/scheduler.c:700-1100 ``Scheduler_Cell_process``; the
driving walk src/sdp/sdp.c:743-814.)

Replaces engine/sdp_device.py's per-diagonal ``lax.scan`` (byte-parity
proven, but dispatch-bound: ~67k sequential XLA steps for a 1 Mb
comparison cost ~641 s where the arithmetic is worth ~2 s) with the
fused-kernel structure of pallas_wavefront.py: every compressed-target
diagonal of the reverse AND forward band passes runs inside two
``pallas_call``s per batch — carry rings in VMEM, reversed-vector
diagonal slicing via 128-aligned windows + ``pltpu.roll``, and the
boundary bit-planes handed from the reverse to the forward kernel as a
31-diagonals-per-int32 packed HBM array (written/read via revisited
grid blocks, so no cross-lane packing is ever needed).

Semantics are mirrored step-for-step from sdp_device.build_pass:

- candidate order (advance_target desc, advance_query desc, reverse
  model position), strict-> replacement, silent sweep after the
  advancing merge (ref: scheduler.c:887-888, 1048-1051);
- per-path maximum (pmax) lanes, dropoff pruning, forward kill of
  negative cells, protect clamps (ref: scheduler.c:1008-1051);
- span freeze/thaw with per-query-column stored/curr registers
  (ref: scheduler.h:111-129, scheduler.c:567-645);
- reverse pass scores shadowed transitions as 0 and emits boundary
  cells (start-state >= 0 or span-state > 0, ref: scheduler.c:965-1000)
  consumed as the forward pass's injection rows;
- edge-liveness and cross-locus-thaw safety flags (any trip falls the
  comparison back to the host native scheduler via sdp_hybrid, so byte
  parity never depends on this kernel).

Per-band end scores are accumulated as a per-column best plane kept in
the reversed-vector frame (one windowed max per diagonal); the XLA
wrapper flips it back and the host segment-reduces per locus.

Boundary-mode models only (``model_uses_boundary`` — est2genome and the
spliced/translated zoo); non-boundary models (plain affine/ungapped
heuristics) stay on the XLA scan / host native path.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..model.ir import (IMPOSSIBLY_LOW_SCORE, IMPOSSIBLY_HIGH_SCORE,
                        Model)
from . import sdp_bands, sdp_device
from .sdp_device import _plan_transitions, _span_plan

NEG = IMPOSSIBLY_LOW_SCORE
POS = IMPOSSIBLY_HIGH_SCORE

_INTERPRET = False          # set True in tests to run the kernel on CPU

# diagonals packed per int32 word of the boundary-bits plane (31 keeps
# every shift off the sign bit)
DPW = 31

MAX_SEED_LAYERS = 4


def _qv(Qp: int) -> int:
    return -(-(Qp + 1) // 128) * 128


def kernel_supported(model: Model, use_boundary: bool, n_layers: int,
                     pair=None) -> bool:
    """Is the fused kernel applicable?  (Callers additionally require
    sdp_device.supported(model).)"""
    if not use_boundary:
        return False            # track_sid attribution not implemented
    if n_layers > MAX_SEED_LAYERS:
        return False
    for c in model.calcs:
        if c.pallas_fn is not None:
            # pallas_fn calcs need their gather-free kernel inputs
            if c.kernel_inputs_fn is None:
                return False
        elif c.shadow_fn is not None and pair is not None:
            # shadow_fn runs in-kernel; its inputs must be scalars
            # (array inputs imply gathers Mosaic cannot legalize)
            if any(np.ndim(v) != 0 for v in
                   pair.shadow_inputs.get(id(c), {}).values()):
                return False
    return True


def count_seed_layers(pair, plan) -> int:
    """Max seeds sharing one compressed column (= seed-vector layers)."""
    from collections import Counter
    cnt = Counter()
    band_ix = 0
    for s in pair.seeds:
        while not (plan.bands[band_ix].t0 <= s.t_cobs
                   <= plan.bands[band_ix].t1):
            band_ix += 1
        cnt[plan.to_v(band_ix, s.t_cobs)] += 1
    return max(cnt.values(), default=1)


def prepare_kernel_inputs(model: Model, pair, plan, Qp: int, Wp: int,
                          n_layers: int):
    """Compact host arrays (flat name->array) + static meta.

    Reuses sdp_device.prepare_inputs for the calc/coordinate vectors so
    the kernel sees byte-identical content to the XLA scan, then adds
    the kernel-only derived forms: factored per-class q-planes,
    per-advance contiguity masks, and column-indexed seed layers."""
    inputs, kinds = sdp_device.prepare_inputs(model, pair, plan,
                                              pad_to=(Qp, Wp))
    kind_map = dict(kinds)
    flat: dict = {}
    meta: dict = {}
    tnames: list = []           # W-axis names: device flip+pad
    for ci, c in enumerate(model.calcs):
        key = f"c{ci}"
        kind = kind_map.get(key)
        if kind == "qt":
            flat[key + ":q"] = np.asarray(inputs[key]["q"], np.int32)
            flat[key + ":t"] = np.asarray(inputs[key]["t"], np.int32)
            tnames.append(key + ":t")
        elif kind == "factored":
            v = inputs[key]
            C = int(v["table"].shape[1])
            meta[key] = C
            qi = np.asarray(v["q_idx"])
            for cc in range(C):
                flat[f"{key}:P{cc}"] = np.asarray(v["table"])[
                    qi, cc].astype(np.int32)
            flat[key + ":tj"] = np.asarray(v["t_idx"], np.int32)
            tnames.append(key + ":tj")
            qo = np.asarray(v["q_over"], np.int32)
            has_ov = bool(qo.any())
            meta[key + ":ov"] = has_ov
            if has_ov:
                flat[key + ":ov"] = qo
        elif kind == "scalar":
            flat[key] = np.asarray(inputs[key], np.int32).reshape(1)
        elif kind == "qvec":
            flat[key] = np.asarray(inputs[key], np.int32)
        elif kind == "tvec":
            flat[key] = np.asarray(inputs[key], np.int32)
            tnames.append(key)
        if c.pallas_fn is not None and c.kernel_inputs_fn is not None:
            # gather-free kernel inputs (wavefront-style kc arrays),
            # target-axis vectors recompressed through the band plan
            Q = pair.region.query_length
            tr = next(t for t in model.transitions if t.calc is c)
            si = np.clip(np.arange(Q + 1) - tr.advance_query, 0, Q)
            for nm, (kkind, arr) in sorted(c.kernel_inputs_fn(
                    pair.region, pair.data).items()):
                kkey = f"kc{ci}:{nm}"
                arr = np.asarray(arr, np.int32)
                if kkind == "qvec":
                    v = np.zeros(Qp + 1, np.int32)
                    v[:Q + 1] = arr[si]
                    flat[kkey] = v
                else:
                    v = np.zeros(Wp + 1, np.int32)
                    v[:plan.W + 1] = arr[plan.abs_t]
                    flat[kkey] = v
                    tnames.append(kkey)
        elif f"sh{ci}" in inputs:
            for n2, v2 in sorted(inputs[f"sh{ci}"].items()):
                flat[f"sh{ci}/{n2}"] = np.asarray(v2,
                                                  np.int32).reshape(1)
    for sx in range(len(model.shadows)):
        if f"shv{sx}" in inputs:
            flat[f"shv{sx}"] = np.asarray(inputs[f"shv{sx}"], np.int32)
            tnames.append(f"shv{sx}")
    flat["_abs_t"] = np.asarray(inputs["_abs_t"], np.int32)
    tnames.append("_abs_t")
    flat["_edge"] = np.asarray(inputs["_edge"], np.int32)
    tnames.append("_edge")
    flat["_seg"] = np.asarray(inputs["_seg"], np.int32)
    tnames.append("_seg")
    flat["_qlen"] = np.asarray(inputs["_qlen"], np.int32).reshape(1)
    flat["_wlen"] = np.asarray(inputs["_wlen"], np.int32).reshape(1)
    W = plan.W
    for at in sorted({t.advance_target for t in model.transitions
                      if t.advance_target}):
        m = np.zeros(Wp + 1, np.int32)
        m[:W + 1] = sdp_bands.contig_mask(plan.abs_t,
                                          at).astype(np.int32)
        flat[f"_contig{at}"] = m
        tnames.append(f"_contig{at}")
    # column-indexed seed layers: the reverse pass injects
    # sc[end][q] = hsp_score >> 1 at (q_cobs, v_cobs); at diagonal d the
    # lane i reads column v = d - i, so the hit condition
    # seed_q[v] == i fires exactly at d = q + v — no per-diagonal
    # scatter needed.  q is stored +1 so the device pad (zeros) can
    # never match a lane.  (ref: seed list sdp.c:439-494)
    by_v: dict = {}
    band_ix = 0
    for s in pair.seeds:
        while not (plan.bands[band_ix].t0 <= s.t_cobs
                   <= plan.bands[band_ix].t1):
            band_ix += 1
        v = plan.to_v(band_ix, s.t_cobs)
        slot = by_v.setdefault(v, {})
        q = s.q_cobs
        half = s.hsp_score >> 1
        slot[q] = max(slot.get(q, NEG), half)
    need = max((len(d) for d in by_v.values()), default=1)
    assert need <= n_layers, (need, n_layers)
    sq = np.zeros((n_layers, Wp + 1), np.int32)
    sv = np.zeros((n_layers, Wp + 1), np.int32)
    for v, dd in by_v.items():
        for lx, (q, val) in enumerate(sorted(dd.items())):
            sq[lx, v] = q + 1
            sv[lx, v] = val
    for lx in range(n_layers):
        flat[f"_seedq{lx}"] = sq[lx]
        tnames.append(f"_seedq{lx}")
        flat[f"_seedv{lx}"] = sv[lx]
        tnames.append(f"_seedv{lx}")
    meta["n_layers"] = n_layers
    meta["tnames"] = tuple(sorted(tnames))
    return flat, kinds, meta


def _ring_plan(model: Model, is_forward: bool):
    """States needing carry-ring rows = inputs of advancing candidates
    in this pass direction."""
    adv_plan, _ = _plan_transitions(model, is_forward)
    ring_states = sorted({e["read"] for e in adv_plan})
    return ring_states


def build_sdp_kernel(model: Model, Qp: int, Wp: int, kinds: tuple,
                     names: tuple, meta: dict, B: int, dropoff: int,
                     interpret: bool | None = None, shard_mesh=None,
                     cross: bool = False):
    """fn(flat_tuple) -> {"colbest": (B, Wp+1), "live": (B,),
    "xband": (B,)} — colbest[b, v] = best forward end score whose end
    cell lies in compressed column v (NEG where none).

    cross=True builds the CROSS-CHIP variant (SURVEY §2.13 wavefront
    sequence-parallelism; ref analogue: span carry across scheduler
    rows, scheduler.h:111-129): the band's W axis is split into
    contiguous per-chip chunks and each chunk's kernel exchanges a halo
    with its neighbour — the carry values of the chunk-edge columns
    (sc/pm/shadow-lane planes for every ring state at the last
    max-advance-target columns) plus the forward span registers.  The
    reverse pass relays right-to-left, the forward pass left-to-right;
    run_kernel_cross_chip orchestrates the per-chip calls and places
    each chunk on its own device.  Returns {"rev": fn, "fwd": fn}
    operating on pre-expanded VLENW buffers."""
    if interpret is None:
        interpret = _INTERPRET
    MAXAT = max((t.advance_target for t in model.transitions), default=1)
    MAXAT = max(MAXAT, 1)
    S = len(model.states)
    n_sh = model.total_shadow_designations
    start_id = model.start_state.state.id
    end_id = model.end_state.state.id
    K = max(max((t.advance_query + t.advance_target
                 for t in model.transitions), default=1), 1)
    R = K + 1
    QV = _qv(Qp)
    PADF = QV + 128
    VLENW = PADF + Wp + 1 + QV + 264
    Dp = Qp + Wp + 1
    NBLK = (Dp + DPW - 1) // DPW
    kind_map = dict(kinds)
    spans = _span_plan(model)
    n_spans = len(spans)
    n_layers = meta["n_layers"]
    tnames = set(meta["tnames"])
    calc_of = {f"c{ci}": c for ci, c in enumerate(model.calcs)}

    def make_kernel(is_forward: bool):
        adv_plan, silent_plan = _plan_transitions(model, is_forward)
        has_lanes = is_forward and n_sh > 0
        ring_states = _ring_plan(model, is_forward)
        ring_row = {s: r for r, s in enumerate(ring_states)}
        NR = max(len(ring_states), 1)
        lane_slots = ([(s, ln) for s in ring_states
                       for ln in range(n_sh)] if has_lanes else [])
        lane_row = {sl: r for r, sl in enumerate(lane_slots)}
        NL = max(len(lane_slots), 1)
        n_span_rows = 8 + 2 * n_sh      # per-span register planes

        def kernel(*refs):
            in_refs = dict(zip(names, refs[:len(names)]))
            nx = len(names)
            bits_in = None
            if is_forward:
                bits_in = refs[nx]
                nx += 1
            e_sc_in = e_pm_in = e_ln_in = span_in = None
            if cross:
                e_sc_in, e_pm_in = refs[nx:nx + 2]
                nx += 2
                if has_lanes:
                    e_ln_in = refs[nx]
                    nx += 1
                if is_forward and n_spans:
                    span_in = refs[nx]
                    nx += 1
            if is_forward:
                colbest, live_o, xband_o = refs[nx:nx + 3]
                nx += 3
            else:
                bits_o, live_o = refs[nx:nx + 2]
                nx += 2
            e_sc_o = e_pm_o = e_ln_o = span_o = None
            if cross:
                e_sc_o, e_pm_o = refs[nx:nx + 2]
                nx += 2
                if has_lanes:
                    e_ln_o = refs[nx]
                    nx += 1
                if is_forward and n_spans:
                    span_o = refs[nx]
                    nx += 1
            ring_sc = refs[nx]
            ring_pm = refs[nx + 1]
            nx += 2
            ring_ln = None
            if has_lanes:
                ring_ln = refs[nx]
                nx += 1
            span_reg = None
            if is_forward and n_spans:
                span_reg = refs[nx]
                nx += 1

            g = pl.program_id(0)
            d = (Dp - 1 - g) if not is_forward else g

            @pl.when(g == 0)
            def _init():
                ring_sc[...] = jnp.full(ring_sc.shape, NEG, jnp.int32)
                ring_pm[...] = jnp.full(ring_pm.shape, NEG, jnp.int32)
                if ring_ln is not None:
                    ring_ln[...] = jnp.zeros(ring_ln.shape, jnp.int32)
                if span_reg is not None:
                    if span_in is not None:
                        # cross-chip: resume the left neighbour's final
                        # span registers (chip 0 receives the canonical
                        # init from the host)
                        span_reg[...] = span_in[...]
                    else:
                        z = jnp.zeros(span_reg.shape, jnp.int32)
                        span_reg[...] = z
                        # st_sc (row 0) and cu_sc (row 4) start at NEG
                        neg = jnp.full((B, QV), NEG, jnp.int32)
                        for spx in range(n_spans):
                            span_reg[spx, 0] = neg
                            span_reg[spx, 4] = neg
                live_o[...] = jnp.zeros(live_o.shape, jnp.int32)
                if cross:
                    e_sc_o[...] = jnp.full(e_sc_o.shape, NEG, jnp.int32)
                    e_pm_o[...] = jnp.full(e_pm_o.shape, NEG, jnp.int32)
                    if e_ln_o is not None:
                        e_ln_o[...] = jnp.zeros(e_ln_o.shape, jnp.int32)
                if is_forward:
                    colbest[...] = jnp.full(colbest.shape, NEG,
                                            jnp.int32)
                    xband_o[...] = jnp.zeros(xband_o.shape, jnp.int32)

            i = jax.lax.broadcasted_iota(jnp.int32, (B, QV), 1)
            j = d - i
            qlen = in_refs["_qlen"][...]            # (B, 1)
            wlen = in_refs["_wlen"][...]
            cell_ok = (j >= 0) & (j <= wlen) & (i <= qlen)
            neg_plane = jnp.full((B, QV), NEG, jnp.int32)
            zero_plane = jnp.zeros((B, QV), jnp.int32)

            tsl_memo: dict = {}

            def tslice(name, shift):
                """Value of a W-axis vector at column j + shift."""
                key = (name, shift)
                if key in tsl_memo:
                    return tsl_memo[key]
                st = PADF + Wp - d - shift
                st0 = (st // 128) * 128
                off = st - st0
                w = in_refs[name][:, pl.ds(st0, QV + 128)]
                v = pltpu.roll(w, (QV + 128) - off, axis=1)[:, :QV]
                tsl_memo[key] = v
                return v

            def shift_q(a, aq, fill):
                """Source lane i -aq (fwd) / i +aq (rev) into lane i."""
                if aq == 0:
                    return a
                if is_forward:
                    return jnp.concatenate(
                        [jnp.full((B, aq), fill, a.dtype), a[:, :-aq]],
                        axis=1)
                return jnp.concatenate(
                    [a[:, aq:], jnp.full((B, aq), fill, a.dtype)],
                    axis=1)

            calc_memo: dict = {}

            def calc_score(key, aq, at):
                """Calc value plane at the calc position: (i-aq, j-at)
                forward, (i, j) reverse (ref: sdp_device.calc_score)."""
                memo = (key, aq, at)
                if memo in calc_memo:
                    return calc_memo[memo]
                kind = kind_map[key]
                sq_ = aq if is_forward else 0
                st_ = -at if is_forward else 0
                if kind == "qt":
                    v = shift_q(in_refs[key + ":q"][...], sq_, 0) \
                        + tslice(key + ":t", st_)
                elif kind == "factored":
                    C = meta[key]
                    tj = tslice(key + ":tj", st_)
                    v = jnp.zeros((B, QV), jnp.int32)
                    for cc in range(C):
                        v = jnp.where(
                            tj == cc,
                            shift_q(in_refs[f"{key}:P{cc}"][...],
                                    sq_, 0), v)
                    if meta.get(key + ":ov", False):
                        ov = shift_q(in_refs[key + ":ov"][...], sq_, 0)
                        v = jnp.where(ov != 0, ov, v)
                elif kind == "scalar":
                    v = in_refs[key][...]           # (B, 1)
                elif kind == "qvec":
                    v = shift_q(in_refs[key][...], sq_, 0)
                else:                               # tvec
                    v = tslice(key, st_)
                calc_memo[memo] = v
                return v

            # running per-state values
            sc = [neg_plane] * S
            pm = [neg_plane] * S
            ln = ([[zero_plane] * n_sh for _ in range(S)]
                  if has_lanes else None)

            # --- injection (first occupant) -------------------------
            thaw_row = None
            if is_forward:
                word = bits_in[0]
                bits = ((word >> (d % DPW)) & 1) != 0
                bits = bits & cell_ok
                row = jnp.where(bits, 0, NEG)
                sc[start_id] = row
                pm[start_id] = row
                thaw_row = bits
            else:
                row = neg_plane
                for lx in range(n_layers):
                    hit = (tslice(f"_seedq{lx}", 0) - 1) == i
                    row = jnp.where(hit & cell_ok,
                                    jnp.maximum(
                                        row, tslice(f"_seedv{lx}", 0)),
                                    row)
                sc[end_id] = row
                pm[end_id] = row

            ev_row = neg_plane          # running per-cell event best

            ring_memo: dict = {}

            def load_src(e):
                """(s_sc, s_pm, s_ln) source planes for a candidate."""
                aq, at, adv = e["aq"], e["at"], e["aq"] + e["at"]
                r = e["read"]
                if adv == 0:
                    return (sc[r], pm[r],
                            list(ln[r]) if has_lanes else None)
                mkey = (r, adv, aq)
                if mkey in ring_memo:
                    return ring_memo[mkey]
                src_d = d - adv if is_forward else d + adv
                slot = jnp.remainder(src_d, R)
                s_sc = shift_q(ring_sc[slot, ring_row[r]], aq, NEG)
                s_pm = shift_q(ring_pm[slot, ring_row[r]], aq, NEG)
                s_ln = None
                if has_lanes:
                    s_ln = [shift_q(ring_ln[slot, lane_row[(r, lx)]],
                                    aq, 0) for lx in range(n_sh)]
                at = adv - aq
                if cross and at:
                    # halo override: source column sj in the neighbour
                    # chunk.  Forward: sj = d-i-at = -k  ->  lane
                    # i = d-at+k; reverse: sj = d-i+at = wlen+k  ->
                    # lane i = d+at-wlen-k.  Edge plane k-1 holds the
                    # neighbour's cell values at that column, indexed
                    # by the neighbour (= global) lane, so the same
                    # aq-shift aligns them.
                    for k in range(1, MAXAT + 1):
                        if is_forward:
                            zone = i == (d - at + k)
                        else:
                            zone = i == (d + at - wlen - k)
                        ev_sc = shift_q(e_sc_in[ring_row[r], k - 1],
                                        aq, NEG)
                        ev_pm = shift_q(e_pm_in[ring_row[r], k - 1],
                                        aq, NEG)
                        s_sc = jnp.where(zone, ev_sc, s_sc)
                        s_pm = jnp.where(zone, ev_pm, s_pm)
                        if has_lanes:
                            s_ln = [jnp.where(
                                zone,
                                shift_q(e_ln_in[lane_row[(r, lx)],
                                                k - 1], aq, 0),
                                s_ln[lx]) for lx in range(n_sh)]
                out = (s_sc, s_pm, s_ln)
                ring_memo[mkey] = out
                return out

            mask_memo: dict = {}

            def src_mask(aq, at):
                """Bounds + band-contiguity validity of the source cell
                (ref: sdp_device eval_candidate src_ok)."""
                mkey = (aq, at)
                if mkey in mask_memo:
                    return mask_memo[mkey]
                if is_forward:
                    si, sj = i - aq, j - at
                else:
                    si, sj = i + aq, j + at
                if cross:
                    # halo columns: sources up to MAXAT columns into
                    # the neighbour chunk are valid (their values come
                    # from the edge planes in load_src)
                    m = cell_ok & (si >= 0) & (si <= qlen) \
                        & (sj >= (-MAXAT if is_forward else 0)) \
                        & (sj <= (wlen if is_forward else wlen + MAXAT))
                else:
                    m = cell_ok & (si >= 0) & (si <= qlen) \
                        & (sj >= 0) & (sj <= wlen)
                if at:
                    # (abs_t[dst] - abs_t[src]) == at, evaluated at the
                    # larger-t column of the pair
                    m = m & (tslice(f"_contig{at}",
                                    0 if is_forward else at) != 0)
                mask_memo[mkey] = m
                return m

            def eval_accept(e):
                nonlocal ev_row
                aq, at = e["aq"], e["at"]
                s_sc, s_pm, s_ln = load_src(e)
                src_ok = src_mask(aq, at)
                if e["rev_shadowed"] or e["calc"] is None:
                    tsc = None
                else:
                    ci = model.calcs.index(e["calc"])
                    tsc = calc_score(f"c{ci}", aq, at)
                    if is_forward and e["calc"].pallas_fn is not None:
                        svals = {nm: s_ln[des]
                                 for nm, des in e["dst_shadows"]}

                        class _Ctx:
                            xp = jnp
                            grid_val = tsc

                            @staticmethod
                            def lane(prefix):
                                for _n, _v in svals.items():
                                    if _n.startswith(prefix):
                                        return _v
                                raise KeyError(prefix)

                            @staticmethod
                            def tslice(nm, _ci=ci, _at=at):
                                return tslice(f"kc{_ci}:{nm}", -_at)

                            @staticmethod
                            def qvec(nm, _ci=ci):
                                return in_refs[f"kc{_ci}:{nm}"][...]

                        tsc = e["calc"].pallas_fn(_Ctx)
                    elif is_forward and e["calc"].shadow_fn is not None:
                        svals = {nm: s_ln[des]
                                 for nm, des in e["dst_shadows"]}
                        sh_in = {
                            nm.split("/", 1)[1]: in_refs[nm][...]
                            for nm in names
                            if nm.startswith(f"sh{ci}/")}
                        qpos = i - aq
                        tpos = tslice("_abs_t", -at)
                        tsc = e["calc"].shadow_fn(jnp, tsc, svals,
                                                  sh_in, qpos, tpos)
                val = s_sc if tsc is None else s_sc + tsc
                if e["p_under"]:
                    val = jnp.maximum(val, NEG)
                if e["p_over"]:
                    val = jnp.minimum(val, POS)
                ok = src_ok & (s_sc > NEG)
                if is_forward:
                    ok = ok & (val >= 0)
                ok = ok & ((s_pm - val) <= dropoff)
                w = e["write"]
                take = ok & (val > sc[w])
                sc[w] = jnp.where(take, val, sc[w])
                pm[w] = jnp.where(take, jnp.maximum(s_pm, val), pm[w])
                if has_lanes:
                    new_l = list(s_ln)
                    for des, start_kind, shvix in e["shadow_starts"]:
                        if shvix is not None:
                            pos = tslice(f"shv{shvix}", -at)
                        elif start_kind == "query_pos":
                            pos = jnp.broadcast_to(i - aq, (B, QV))
                        else:
                            pos = tslice("_abs_t", -at)
                        new_l[des] = pos
                    for lx in range(n_sh):
                        ln[w][lx] = jnp.where(take, new_l[lx],
                                              ln[w][lx])
                if e["event"]:
                    ev = take & (val >= s_pm)
                    ev_row = jnp.where(ev, val, ev_row)

            for e in adv_plan:
                eval_accept(e)

            # --- span thaw + submit (forward only) ------------------
            # runs BEFORE the silent sweep (mirroring sdp_device) so
            # silent exits from span states — ner's `ner to match` —
            # read the post-thaw value per the reference's per-cell
            # transition order (ref: scheduler.c:891-985); supported
            # models have no silent WRITES into span states
            xband_hit = None
            if is_forward and n_spans:
                abs_tv = tslice("_abs_t", 0)
                seg_row = tslice("_seg", 0)
                for spx, sp in enumerate(spans):
                    st = sp["state"]
                    st_sc = span_reg[spx, 0]
                    st_pm = span_reg[spx, 1]
                    st_te = span_reg[spx, 2]
                    st_sg = span_reg[spx, 3]
                    cu_sc = span_reg[spx, 4]
                    cu_pm = span_reg[spx, 5]
                    cu_te = span_reg[spx, 6]
                    cu_sg = span_reg[spx, 7]
                    st_ln = [span_reg[spx, 8 + lx]
                             for lx in range(n_sh)]
                    cu_ln = [span_reg[spx, 8 + n_sh + lx]
                             for lx in range(n_sh)]
                    if sp["max_target"] == 0:
                        # query-only span: the reference submit is a
                        # no-op (scheduler.c:619-641) — never thaws
                        continue
                    if sp["max_query"] > 0:
                        # joint span (ner, genome2genome): the
                        # reference's curr register walking the row is
                        # a per-lane plane advanced ONE LANE per
                        # diagonal (see sdp_device build_pass); pickup
                        # only at thaw cells from the own-lane stored
                        # seed, strictly-greater replacement
                        shl = lambda v, fill: jnp.concatenate(
                            [jnp.full((B, 1), fill, v.dtype),
                             v[:, :-1]], axis=1)
                        r_sc = shl(cu_sc, NEG)
                        r_pm = shl(cu_pm, 0)
                        r_te = shl(cu_te, 0)
                        r_sg = shl(cu_sg, 0)
                        r_ln = [shl(v, 0) for v in cu_ln]
                        r_ok = (r_sc > NEG) & \
                            ((r_te + sp["max_target"]) >= abs_tv)
                        st_ok = (st_sc > NEG) & \
                            ((st_te + sp["max_target"]) >= abs_tv)
                        upd = thaw_row & st_ok & \
                            (~r_ok | (r_sc < st_sc))
                        r_sc = jnp.where(upd, st_sc,
                                         jnp.where(r_ok, r_sc, NEG))
                        r_pm = jnp.where(upd, st_pm, r_pm)
                        r_te = jnp.where(upd, st_te, r_te)
                        r_sg = jnp.where(upd, st_sg, r_sg)
                        r_ln = [jnp.where(upd, st_ln[lx], r_ln[lx])
                                for lx in range(n_sh)]
                        th = thaw_row & (r_sc > NEG) & (sc[st] < r_sc)
                        xb = th & (r_sg != seg_row)
                        xband_hit = xb if xband_hit is None \
                            else (xband_hit | xb)
                        pre_sc, pre_pm = sc[st], pm[st]
                        pre_ln = list(ln[st]) if has_lanes else None
                        sc[st] = jnp.where(th, r_sc, sc[st])
                        pm[st] = jnp.where(th, r_pm, pm[st])
                        if has_lanes:
                            for lx in range(n_sh):
                                ln[st][lx] = jnp.where(
                                    th, r_ln[lx], ln[st][lx])
                        if sp["submit_post_thaw"]:
                            sub_sc, sub_pm = sc[st], pm[st]
                            sub_ln = ln[st] if has_lanes else None
                        else:
                            sub_sc, sub_pm = pre_sc, pre_pm
                            sub_ln = pre_ln
                        rep = cell_ok & (sub_sc >= 0) & \
                            (sub_sc >= st_sc)
                        span_reg[spx, 0] = jnp.where(rep, sub_sc,
                                                     st_sc)
                        span_reg[spx, 1] = jnp.where(rep, sub_pm,
                                                     st_pm)
                        span_reg[spx, 2] = jnp.where(rep, abs_tv,
                                                     st_te)
                        span_reg[spx, 3] = jnp.where(rep, seg_row,
                                                     st_sg)
                        span_reg[spx, 4] = r_sc
                        span_reg[spx, 5] = r_pm
                        span_reg[spx, 6] = r_te
                        span_reg[spx, 7] = r_sg
                        for lx in range(n_sh):
                            span_reg[spx, 8 + lx] = jnp.where(
                                rep, sub_ln[lx], st_ln[lx])
                            span_reg[spx, 8 + n_sh + lx] = r_ln[lx]
                        continue
                    # expire stored at thaw cells
                    in_w = (st_te + sp["max_target"]) >= abs_tv
                    expired = thaw_row & (st_sc > NEG) & ~in_w
                    st_sc = jnp.where(expired, NEG, st_sc)
                    # curr: expire by window, refresh from stored
                    cu_ok = (cu_sc > NEG) & \
                        ((cu_te + sp["max_target"]) >= abs_tv)
                    upd = thaw_row & (st_sc > NEG) & in_w & \
                        (~cu_ok | (cu_sc < st_sc))
                    cu_sc = jnp.where(thaw_row & ~cu_ok & ~upd, NEG,
                                      jnp.where(upd, st_sc, cu_sc))
                    cu_pm = jnp.where(upd, st_pm, cu_pm)
                    cu_te = jnp.where(upd, st_te, cu_te)
                    cu_sg = jnp.where(upd, st_sg, cu_sg)
                    if n_sh:
                        cu_ln = [jnp.where(upd, st_ln[lx], cu_ln[lx])
                                 for lx in range(n_sh)]
                    # thaw into the cell (strict <)
                    th = thaw_row & (cu_sc > NEG) & (sc[st] < cu_sc)
                    xb = th & (cu_sg != seg_row)
                    xband_hit = xb if xband_hit is None \
                        else (xband_hit | xb)
                    pre_sc, pre_pm = sc[st], pm[st]
                    pre_ln = list(ln[st]) if has_lanes else None
                    sc[st] = jnp.where(th, cu_sc, sc[st])
                    pm[st] = jnp.where(th, cu_pm, pm[st])
                    if has_lanes:
                        for lx in range(n_sh):
                            ln[st][lx] = jnp.where(th, cu_ln[lx],
                                                   ln[st][lx])
                    # submit (pre- or post-thaw per transition order)
                    if sp["submit_post_thaw"]:
                        sub_sc, sub_pm = sc[st], pm[st]
                        sub_ln = ln[st] if has_lanes else None
                    else:
                        sub_sc, sub_pm = pre_sc, pre_pm
                        sub_ln = pre_ln
                    rep = cell_ok & (sub_sc >= 0) & (sub_sc >= st_sc)
                    span_reg[spx, 0] = jnp.where(rep, sub_sc, st_sc)
                    span_reg[spx, 1] = jnp.where(rep, sub_pm, st_pm)
                    span_reg[spx, 2] = jnp.where(rep, abs_tv, st_te)
                    span_reg[spx, 3] = jnp.where(rep, seg_row, st_sg)
                    span_reg[spx, 4] = cu_sc
                    span_reg[spx, 5] = cu_pm
                    span_reg[spx, 6] = cu_te
                    span_reg[spx, 7] = cu_sg
                    for lx in range(n_sh):
                        span_reg[spx, 8 + lx] = jnp.where(
                            rep, sub_ln[lx], st_ln[lx])
                        span_reg[spx, 8 + n_sh + lx] = cu_ln[lx]

            for e in silent_plan:
                eval_accept(e)

            # --- finalize: mask invalid cells -----------------------
            for s in range(S):
                sc[s] = jnp.where(cell_ok, sc[s], NEG)

            # --- liveness / boundary bits / events ------------------
            any_live = zero_plane != 0
            for s in range(S):
                any_live = any_live | (sc[s] > NEG)
            edge = tslice("_edge", 0) != 0
            live_o[...] = live_o[...] | \
                (any_live & edge & cell_ok).astype(jnp.int32)

            if is_forward:
                if xband_hit is not None:
                    xband_o[...] = xband_o[...] | \
                        xband_hit.astype(jnp.int32)
                # per-column best end score, accumulated in the
                # reversed-vector frame: lane i of diagonal d is
                # column j = d - i at buffer position
                # PADF + Wp - d + i
                st = PADF + Wp - d
                st0 = (st // 128) * 128
                off = st - st0
                ev_pad = jnp.concatenate(
                    [ev_row, jnp.full((B, 128), NEG, jnp.int32)],
                    axis=1)
                rolled = pltpu.roll(ev_pad, off, axis=1)
                win = colbest[:, pl.ds(st0, QV + 128)]
                colbest[:, pl.ds(st0, QV + 128)] = \
                    jnp.maximum(win, rolled)
            else:
                flag = sc[start_id] >= 0
                for sp in spans:
                    flag = flag | (sc[sp["state"]] > 0)
                flag = flag & cell_ok
                first = (d % DPW == (DPW - 1)) | (g == 0)

                @pl.when(first)
                def _zero_block():
                    bits_o[...] = jnp.zeros(bits_o.shape, jnp.int32)

                shift = jnp.int32(1) << (d % DPW)
                bits_o[...] = bits_o[...] | \
                    (flag.astype(jnp.int32) * shift)

            # --- ring store -----------------------------------------
            slot = jnp.remainder(d, R)
            for s in ring_states:
                ring_sc[slot, ring_row[s]] = sc[s]
                ring_pm[slot, ring_row[s]] = pm[s]
            if has_lanes:
                for (s, lx) in lane_slots:
                    ring_ln[slot, lane_row[(s, lx)]] = ln[s][lx]

            # --- halo export ----------------------------------------
            if cross:
                # forward consumers read our columns wlen+1-k (k-th
                # from the right); reverse consumers read our columns
                # k-1 (k-th from the left).  One lane per diagonal per
                # k; accumulate post-silent finalized values.
                for k in range(1, MAXAT + 1):
                    if is_forward:
                        exp = (j == (wlen + 1 - k)) & cell_ok
                    else:
                        exp = (j == (k - 1)) & cell_ok
                    for s in ring_states:
                        row = ring_row[s]
                        e_sc_o[row, k - 1] = jnp.where(
                            exp, sc[s], e_sc_o[row, k - 1])
                        e_pm_o[row, k - 1] = jnp.where(
                            exp, pm[s], e_pm_o[row, k - 1])
                    if has_lanes:
                        for (s, lx) in lane_slots:
                            lrow = lane_row[(s, lx)]
                            e_ln_o[lrow, k - 1] = jnp.where(
                                exp, ln[s][lx], e_ln_o[lrow, k - 1])
                if span_o is not None:
                    @pl.when(g == Dp - 1)
                    def _dump_span():
                        span_o[...] = span_reg[...]

        scratch = [pltpu.VMEM((R, NR, B, QV), jnp.int32),
                   pltpu.VMEM((R, NR, B, QV), jnp.int32)]
        if has_lanes:
            scratch.append(pltpu.VMEM((R, NL, B, QV), jnp.int32))
        if is_forward and n_spans:
            scratch.append(pltpu.VMEM((n_spans, n_span_rows, B, QV),
                                      jnp.int32))
        dims = {"NR": NR, "NL": NL, "nsr": n_span_rows,
                "has_lanes": has_lanes}
        return kernel, scratch, dims

    rev_kernel, rev_scratch, rev_dims = make_kernel(False)
    fwd_kernel, fwd_scratch, fwd_dims = make_kernel(True)

    def in_spec(name, a):
        return pl.BlockSpec(a.shape,
                            functools.partial(
                                lambda nd, _d: (0,) * nd, len(a.shape)))

    def full_spec(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape,
                            functools.partial(
                                lambda n, _g: (0,) * n, nd))

    if cross:
        # cross-chip variant: rev/fwd exposed separately, operating on
        # PRE-EXPANDED VLENW buffers (the host writes neighbour-context
        # columns into the tail positions tslice resolves for j<0 /
        # j>wlen); edge planes + span registers relay between chips.
        cp = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(os.environ.get(
                "EXONERATE_TPU_KERNEL_VMEM_MB", "100")) << 20)

        def edge_shapes(dims, fwd):
            shp = [jax.ShapeDtypeStruct((dims["NR"], MAXAT, B, QV),
                                        jnp.int32)] * 2
            if dims["has_lanes"]:
                shp.append(jax.ShapeDtypeStruct(
                    (dims["NL"], MAXAT, B, QV), jnp.int32))
            if fwd and n_spans:
                shp.append(jax.ShapeDtypeStruct(
                    (n_spans, dims["nsr"], B, QV), jnp.int32))
            return shp

        @jax.jit
        def rev_fn(flat_arrays, edges_in):
            e_shapes = edge_shapes(rev_dims, False)
            out = pl.pallas_call(
                rev_kernel,
                grid=(Dp,),
                in_specs=[in_spec(n, a)
                          for n, a in zip(names, flat_arrays)]
                + [full_spec(e) for e in edges_in],
                out_specs=[
                    pl.BlockSpec((1, B, QV),
                                 lambda g: ((Dp - 1 - g) // DPW, 0, 0)),
                    pl.BlockSpec((B, QV), lambda g: (0, 0)),
                ] + [full_spec(e) for e in e_shapes],
                out_shape=[
                    jax.ShapeDtypeStruct((NBLK, B, QV), jnp.int32),
                    jax.ShapeDtypeStruct((B, QV), jnp.int32),
                ] + e_shapes,
                scratch_shapes=rev_scratch,
                compiler_params=cp,
                interpret=interpret,
            )(*flat_arrays, *edges_in)
            bits, live = out[0], out[1]
            return bits, live, tuple(out[2:])

        @jax.jit
        def fwd_fn(flat_arrays, bits, edges_in):
            e_shapes = edge_shapes(fwd_dims, True)
            out = pl.pallas_call(
                fwd_kernel,
                grid=(Dp,),
                in_specs=[in_spec(n, a)
                          for n, a in zip(names, flat_arrays)]
                + [pl.BlockSpec((1, B, QV), lambda g: (g // DPW, 0, 0))]
                + [full_spec(e) for e in edges_in],
                out_specs=[
                    pl.BlockSpec((B, VLENW), lambda g: (0, 0)),
                    pl.BlockSpec((B, QV), lambda g: (0, 0)),
                    pl.BlockSpec((B, QV), lambda g: (0, 0)),
                ] + [full_spec(e) for e in e_shapes],
                out_shape=[
                    jax.ShapeDtypeStruct((B, VLENW), jnp.int32),
                    jax.ShapeDtypeStruct((B, QV), jnp.int32),
                    jax.ShapeDtypeStruct((B, QV), jnp.int32),
                ] + e_shapes,
                scratch_shapes=fwd_scratch,
                compiler_params=cp,
                interpret=interpret,
            )(*flat_arrays, bits, *edges_in)
            colbest_rev, live, xband = out[0], out[1], out[2]
            col = jnp.flip(colbest_rev[:, PADF:PADF + Wp + 1], axis=1)
            return col, live, xband, tuple(out[3:])

        return {"rev": rev_fn, "fwd": fwd_fn,
                "dims": {"rev": rev_dims, "fwd": fwd_dims,
                         "MAXAT": MAXAT, "QV": QV, "VLENW": VLENW,
                         "PADF": PADF, "Dp": Dp, "n_spans": n_spans}}

    def _expand(name, x):
        """Compact host form -> kernel layout (device-side): widen the
        batch dim, pad q-axis names to QV, flip+pad W-axis names into
        the reversed VLENW frame."""
        if name in tnames:
            x = jnp.flip(x, axis=1)
            x = jnp.pad(x, ((0, 0),
                            (PADF, VLENW - PADF - x.shape[1])))
        elif x.ndim == 2 and x.shape[1] > 1:
            x = jnp.pad(x, ((0, 0), (0, QV - x.shape[1])))
        return x

    def core(*flat_arrays):
        flat_arrays = tuple(_expand(n, a)
                            for n, a in zip(names, flat_arrays))
        rev_out = pl.pallas_call(
            rev_kernel,
            grid=(Dp,),
            in_specs=[in_spec(n, a)
                      for n, a in zip(names, flat_arrays)],
            out_specs=[
                pl.BlockSpec((1, B, QV),
                             lambda g: ((Dp - 1 - g) // DPW, 0, 0)),
                pl.BlockSpec((B, QV), lambda g: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NBLK, B, QV), jnp.int32),
                jax.ShapeDtypeStruct((B, QV), jnp.int32),
            ],
            scratch_shapes=rev_scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=int(os.environ.get(
                    "EXONERATE_TPU_KERNEL_VMEM_MB", "100")) << 20),
            interpret=interpret,
        )(*flat_arrays)
        bits, rev_live = rev_out
        fwd_out = pl.pallas_call(
            fwd_kernel,
            grid=(Dp,),
            in_specs=[in_spec(n, a)
                      for n, a in zip(names, flat_arrays)]
            + [pl.BlockSpec((1, B, QV), lambda g: (g // DPW, 0, 0))],
            out_specs=[
                pl.BlockSpec((B, VLENW), lambda g: (0, 0)),
                pl.BlockSpec((B, QV), lambda g: (0, 0)),
                pl.BlockSpec((B, QV), lambda g: (0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, VLENW), jnp.int32),
                jax.ShapeDtypeStruct((B, QV), jnp.int32),
                jax.ShapeDtypeStruct((B, QV), jnp.int32),
            ],
            scratch_shapes=fwd_scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=int(os.environ.get(
                    "EXONERATE_TPU_KERNEL_VMEM_MB", "100")) << 20),
            interpret=interpret,
        )(*flat_arrays, bits)
        colbest_rev, fwd_live, xband = fwd_out
        # reversed frame -> column frame: column v sits at
        # PADF + Wp - v
        col = jnp.flip(colbest_rev[:, PADF:PADF + Wp + 1], axis=1)
        live = (jnp.max(rev_live, axis=1)
                | jnp.max(fwd_live, axis=1)) != 0
        xb = jnp.max(xband, axis=1) != 0
        # ONE fetched array per call (each fetch is a tunnel
        # round-trip): columns [0, Wp] = colbest, Wp+1 = live,
        # Wp+2 = xband
        return jnp.concatenate(
            [col, live[:, None].astype(jnp.int32),
             xb[:, None].astype(jnp.int32)], axis=1)

    if shard_mesh is not None:
        # pod-scale scan scheduler: the comparison batch data-parallel
        # over every mesh axis, each device running its shard's fused
        # band scan with no cross-device traffic inside the DP
        # (SURVEY.md §2.13: the reference's --querychunkid external
        # concat, done as a shard_map)
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        axes = tuple(shard_mesh.shape.keys())
        smapped = shard_map(core, mesh=shard_mesh,
                            in_specs=tuple(P(axes) for _ in names),
                            out_specs=P(axes), check_rep=False)

        @jax.jit
        def fn(flat_arrays):
            return smapped(*flat_arrays)

        return fn

    @jax.jit
    def fn(flat_arrays):
        return core(*flat_arrays)

    return fn


_CACHE: dict = {}


def get_kernel_fn(model: Model, Qp: int, Wp: int, kinds: tuple,
                  names: tuple, meta_key: tuple, meta: dict, B: int,
                  dropoff: int, interpret: bool | None = None,
                  shard_mesh=None, cross: bool = False):
    from ..model.ir import model_fingerprint
    key = (model_fingerprint(model), Qp, Wp, kinds, names, meta_key, B,
           dropoff, bool(interpret), _INTERPRET, cross,
           id(shard_mesh) if shard_mesh is not None else None)
    if key not in _CACHE:
        _CACHE[key] = build_sdp_kernel(model, Qp, Wp, kinds, names,
                                       meta, B, dropoff,
                                       interpret=interpret,
                                       shard_mesh=shard_mesh,
                                       cross=cross)
    return _CACHE[key]


SDPK_VMEM_BYTES = 72 << 20


def _max_batch(model: Model, Qp: int, Wp: int, n_tvec: int) -> int:
    """Largest batch whose VMEM residents (t-vectors + carry rings +
    span registers + column-best buffer) fit the budget."""
    S = len(model.states)
    n_sh = model.total_shadow_designations
    K = max(max((t.advance_query + t.advance_target
                 for t in model.transitions), default=1), 1)
    R = K + 1
    QV = _qv(Qp)
    VLENW = (QV + 128) + Wp + 1 + QV + 264
    per_pair = (n_tvec + 1) * VLENW * 4 \
        + R * S * (2 + n_sh) * QV * 4 \
        + len(model.spans) * (8 + 2 * n_sh) * QV * 4 \
        + 12 * QV * 4
    return max(1, SDPK_VMEM_BYTES // per_pair)


def run_kernel(model: Model, jobs: list, dropoff: int,
               interpret: bool | None = None, mesh=None) -> list:
    """jobs: [(pair, plan)] — batched per (shape, kinds) bucket.
    Returns per-job dicts {"band_end": [n_loci], "live": bool,
    "xband": bool} shaped like sdp_device's outputs (band_end indexed
    by locus).  ``mesh``: optional jax Mesh — the comparison batch runs
    data-parallel over every mesh axis via shard_map (pod-scale scan
    scheduling)."""
    from .wavefront import _bucket
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
    out: list = [None] * len(jobs)
    prepped = []
    for ix, (pair, plan) in enumerate(jobs):
        Qp = _bucket(pair.region.query_length)
        Wp = _pow2(max(plan.W, 1023))
        n_layers = count_seed_layers(pair, plan)
        prepped.append((ix, pair, plan, Qp, Wp, n_layers))
    buckets: dict = {}
    for ix, pair, plan, Qp, Wp, n_layers in prepped:
        buckets.setdefault((Qp, Wp), []).append(
            (ix, pair, plan, n_layers))
    chunked: dict = {}
    for (Qp, Wp), items in buckets.items():
        n_tvec = 8 + 2 * len(model.calcs)       # generous estimate
        cap = _max_batch(model, Qp, Wp, n_tvec)
        p = 1
        while p * 2 <= cap:
            p *= 2
        cap = p * n_dev                 # per-device VMEM bound
        for k in range(0, len(items), cap):
            chunk = items[k:k + cap]
            b = 1
            while b < len(chunk):
                b *= 2
            b = max(b, n_dev)
            # pad to a power of two (>= device count when meshed) with
            # copies of the last job so the batch dim stays in a tiny
            # compiled-shape set and shards evenly
            chunk = chunk + [chunk[-1]] * (b - len(chunk))
            chunked[(Qp, Wp, k)] = (items[k:k + cap], chunk)
    # dispatch every chunk first, then fetch: through the TPU tunnel a
    # fetch is ~0.3-0.5 s of round-trip latency, so sequential
    # dispatch+fetch per chunk serializes dead time the device could
    # spend computing the next chunk
    pending = []
    for (Qp, Wp, _k), (real_items, items) in chunked.items():
        n_layers = max(x[3] for x in items)
        flats = []
        kinds = meta = None
        for ix, pair, plan, _nl in items:
            flat, kinds_i, meta_i = prepare_kernel_inputs(
                model, pair, plan, Qp, Wp, n_layers)
            if kinds is None:
                kinds, meta = kinds_i, meta_i
            else:
                assert kinds_i == kinds
                # ov flags may differ pair-to-pair; unify: any pair
                # with an override forces the plane for the bucket
                for k, v in meta_i.items():
                    if str(k).endswith(":ov") and v and not meta[k]:
                        meta[k] = True
            flats.append((ix, flat))
        # unify names: pairs lacking an :ov plane ship zeros
        all_names = sorted({n for _, f in flats for n in f})
        B = len(flats)
        stacked = []
        for n in all_names:
            arrs = []
            for _, f in flats:
                a = f.get(n)
                if a is None:
                    proto = next(ff[n] for _, ff in flats if n in ff)
                    a = np.zeros_like(proto)
                arrs.append(a)
            stacked.append(np.stack(arrs))
        names = tuple(all_names)
        meta_key = tuple(sorted(
            (k, v) for k, v in meta.items() if k != "tnames"))
        fn = get_kernel_fn(model, Qp, Wp, kinds, names, meta_key,
                           meta, B // n_dev, dropoff,
                           interpret=interpret, shard_mesh=mesh)
        # content-addressed H2D: a scan re-dispatches identical input
        # stacks (cold->warm runs, bestn rescans); through a TPU tunnel
        # re-shipping them dominates, so reuse the wavefront engine's
        # device-input cache
        from .pallas_wavefront import _put_cached
        pending.append((fn(_put_cached(stacked)), Wp, items))
    # fetch concurrently: each fetch is dominated by tunnel round-trip
    # latency, so serial fetches of K chunks pay K x ~0.5 s
    if len(pending) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=len(pending)) as ex:
            fetched = list(ex.map(lambda p: np.asarray(p[0]), pending))
    else:
        fetched = [np.asarray(p[0]) for p in pending]
    for packed, (_dev, Wp, items) in zip(fetched, pending):
        col = packed[:, :Wp + 1]
        live = packed[:, Wp + 1] != 0
        xb = packed[:, Wp + 2] != 0
        for b, (ix, pair, plan, _nl) in enumerate(items):
            n_loci = len(plan.loci)
            band_end = np.full(max(n_loci, 1), NEG, np.int64)
            if n_loci:
                locus_of_v = plan.locus_of_v
                c = col[b, :plan.W + 1].astype(np.int64)
                np.maximum.at(band_end, locus_of_v, c)
            out[ix] = {"band_end": band_end,
                       "live": bool(live[b]),
                       "xband": bool(xb[b])}
    return out


def _pow2(n: int) -> int:
    p = 1024
    while p < n:
        p <<= 1
    return p


def run_kernel_cross_chip(model: Model, pair, plan, dropoff: int,
                          n_chips: int, interpret: bool | None = None,
                          devices=None) -> dict:
    """ONE comparison pair spanning chips through the fused band-scan
    kernel (SURVEY §2.13 cross-chip sequence parallelism; VERDICT r3
    missing #2).  The compressed W axis splits into contiguous per-chip
    chunks; each chunk runs the SAME kernel with a halo interface: the
    neighbour's last max-advance-target columns' carry values (sc/pm/
    shadow-lane planes per ring state) plus the forward span registers
    relay chip-to-chip (the reference analogue is the scheduler's span
    carry across rows, ref: scheduler.h:111-129).  The reverse pass
    relays right-to-left, the forward pass left-to-right.  With
    ``devices`` given, chunk c's arrays live on devices[c] and the halo
    is the only cross-device traffic (max_at * ring-states * QV int32s
    per hop — ICI-sized).  Returns the same result dict as run_kernel
    for a single job; byte-identical to the single-chip kernel."""
    from .wavefront import _bucket
    Q = pair.region.query_length
    Qp = _bucket(Q)
    W = plan.W
    MAXAT = max((t.advance_target for t in model.transitions),
                default=1) or 1
    n_layers = count_seed_layers(pair, plan)
    Wg = _pow2(max(W, 1023))
    flat_g, kinds, meta = prepare_kernel_inputs(model, pair, plan, Qp,
                                                Wg, n_layers)
    names = tuple(sorted(flat_g))
    tnames = set(meta["tnames"])
    meta_key = tuple(sorted(
        (k, v) for k, v in meta.items() if k != "tnames"))
    chunk = -(-(W + 1) // n_chips)
    Wpc = _pow2(chunk + MAXAT)
    QV = _qv(Qp)
    PADF = QV + 128
    VLENW = PADF + Wpc + 1 + QV + 264
    kern = get_kernel_fn(model, Qp, Wpc, kinds, names, meta_key, meta,
                         1, dropoff, interpret=interpret, cross=True)
    rev_fn, fwd_fn = kern["rev"], kern["fwd"]
    dims = kern["dims"]
    n_spans = dims["n_spans"]

    # per-chip pre-expanded buffers
    chips = []
    no_seed = {f"_seedq{lx}" for lx in range(n_layers)} \
        | {f"_seedv{lx}" for lx in range(n_layers)}
    c = 0
    while c * chunk <= W:
        v0 = c * chunk
        v1 = min(v0 + chunk - 1, W)
        wlen = v1 - v0
        arrs = []
        for n in names:
            g = np.asarray(flat_g[n])
            if n == "_wlen":
                a = np.full((1, 1), wlen, np.int32)
            elif n in tnames:
                vec = np.zeros(Wpc + 1, np.int32)
                vec[:wlen + 1] = g[v0:v1 + 1]
                if n not in no_seed:
                    kr = min(MAXAT, W - v1)
                    if kr > 0:
                        vec[wlen + 1:wlen + 1 + kr] = g[v1 + 1:
                                                        v1 + 1 + kr]
                buf = np.zeros((1, VLENW), np.int32)
                buf[0, PADF:PADF + Wpc + 1] = vec[::-1]
                if n not in no_seed:
                    kl = min(MAXAT, v0)
                    for k in range(1, kl + 1):
                        buf[0, PADF + Wpc + k] = g[v0 - k]
                a = buf
            elif g.ndim == 1 and g.shape[0] > 1:
                a = np.zeros((1, QV), np.int32)
                a[0, :g.shape[0]] = g
            else:
                a = g.reshape(1, -1).astype(np.int32)
            arrs.append(a)
        dev = devices[c % len(devices)] if devices else None
        arrs = tuple(jax.device_put(jnp.asarray(a), dev) if dev
                     else jnp.asarray(a) for a in arrs)
        chips.append({"v0": v0, "v1": v1, "wlen": wlen, "arrs": arrs,
                      "dev": dev})
        c += 1
    n_eff = len(chips)

    def neg_edges(dims_d, fwd):
        e = [jnp.full((dims_d["NR"], MAXAT, 1, QV), NEG, jnp.int32),
             jnp.full((dims_d["NR"], MAXAT, 1, QV), NEG, jnp.int32)]
        if dims_d["has_lanes"]:
            e.append(jnp.zeros((dims_d["NL"], MAXAT, 1, QV), jnp.int32))
        if fwd and n_spans:
            sp0 = np.zeros((n_spans, dims_d["nsr"], 1, QV), np.int32)
            sp0[:, 0] = NEG
            sp0[:, 4] = NEG
            e.append(jnp.asarray(sp0))
        return tuple(e)

    def _put(x, dev):
        return jax.device_put(x, dev) if dev is not None else x

    # reverse sweep: right -> left
    bits_per_chip = [None] * n_eff
    live_any = False
    edges = neg_edges(dims["rev"], False)
    for cx in range(n_eff - 1, -1, -1):
        ch = chips[cx]
        edges = jax.tree_util.tree_map(
            lambda x: _put(x, ch["dev"]), edges)
        bits, live, edges = rev_fn(ch["arrs"], edges)
        bits_per_chip[cx] = bits
        live_any = live_any or bool(np.asarray(live).max())

    # forward sweep: left -> right
    col_g = np.full(W + 1, NEG, np.int64)
    xb_any = False
    edges = neg_edges(dims["fwd"], True)
    for cx in range(n_eff):
        ch = chips[cx]
        edges = jax.tree_util.tree_map(
            lambda x: _put(x, ch["dev"]), edges)
        col, live, xband, edges = fwd_fn(ch["arrs"],
                                         bits_per_chip[cx], edges)
        live_any = live_any or bool(np.asarray(live).max())
        xb_any = xb_any or bool(np.asarray(xband).max())
        col_np = np.asarray(col)[0, :ch["wlen"] + 1]
        col_g[ch["v0"]:ch["v1"] + 1] = col_np.astype(np.int64)

    n_loci = len(plan.loci)
    band_end = np.full(max(n_loci, 1), NEG, np.int64)
    if n_loci:
        np.maximum.at(band_end, plan.locus_of_v, col_g)
    return {"band_end": band_end, "live": live_any, "xband": xb_any}


