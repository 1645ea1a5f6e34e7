"""Cross-chip sequence parallelism for one gapped pair.

One pair's full DP spans a device mesh: the anti-diagonal wavefront's
per-diagonal state vectors (score + shadow lanes per model state,
indexed by query position) shard over the 'sp' mesh axis, so each chip
owns a query slab of every diagonal.  The only cross-slab dataflow in
the recurrence is the advance-query roll of the previous diagonals
(engine/wavefront.py step): under jit with sharded carries XLA lowers
those rolls to collective permutes over ICI — the halo exchange — while
calc gathers and the transition max-merges stay chip-local.

This genuinely splits a single DP's state across chips (the role ring
attention plays for long sequences, SURVEY.md §2.13 row 5); for
long-*target* workloads the production decomposition is the seeded band
scan (engine/sdp_device.py), whose dense bands are data-parallel, so
the sharded single-pair path targets tall queries and exhaustive runs.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model.ir import Model
from ..engine.region import Region
from ..engine import wavefront
from ..engine.reference import DPResult


_CACHE: dict = {}


def _sharded_fn(model: Model, Q: int, T: int, mode: str, kinds: tuple,
                mesh: Mesh, axis: str, shard_len: int):
    """shard_len selects which axis's arrays pin to mesh[axis]:
    Q+1 -> query-slab sharding (diagonal state vectors split over
    chips; rolls lower to collective permutes), T+1 -> target-tiled
    sharding (the per-target-position vectors — splice PSSM scores,
    factored class indices — split over chips, the memory that scales
    with chromosome length; per-diagonal window reads lower to
    collectives over ICI)."""
    key = (id(model), Q, T, mode, kinds, id(mesh), axis, shard_len)
    if key not in _CACHE:
        fn = wavefront.build_wavefront(model, Q, T, mode, kinds)
        sharding = NamedSharding(mesh, P(axis))

        def run(inputs):
            pinned = {}
            for k, v in inputs.items():
                if hasattr(v, "ndim") and getattr(v, "ndim", 0) == 1 \
                        and v.shape[0] == shard_len:
                    pinned[k] = jax.lax.with_sharding_constraint(
                        jax.numpy.asarray(v), sharding)
                else:
                    pinned[k] = v
            return fn(pinned)

        _CACHE[key] = jax.jit(run)
    return _CACHE[key]


def _pad_to_multiple(Q: int, n: int) -> int:
    return ((Q + 1 + n - 1) // n) * n - 1


def find_region_sharded_pair(model: Model, region: Region, data,
                             mesh: Mesh, axis: str = "sp") -> DPResult:
    """FIND_REGION for ONE pair with the DP state sharded over
    mesh[axis].  Scores are exactly the single-device wavefront's."""
    n = int(np.prod([s for name, s in zip(mesh.axis_names, mesh.devices.shape)
                     if name == axis]) or 1)
    Qp = _pad_to_multiple(region.query_length, max(n, 1))
    Tp = region.target_length
    inputs, kinds = wavefront.prepare_inputs(model, region, data,
                                             pad_to=(Qp, Tp))
    fn = _sharded_fn(model, Qp, Tp, "region", kinds, mesh, axis,
                     Qp + 1)
    with mesh:
        out = jax.tree_util.tree_map(
            lambda x: np.asarray(x), fn(inputs))
    return DPResult(score=int(out["score"]),
                    query_end=int(out["query_end"]),
                    target_end=int(out["target_end"]),
                    query_start=int(out["query_start"]),
                    target_start=int(out["target_start"]))


def find_region_target_tiled(model: Model, region: Region, data,
                             mesh: Mesh, axis: str = "sp") -> DPResult:
    """FIND_REGION for ONE pair with the TARGET axis tiled over
    mesh[axis] (SURVEY.md §2.13: chromosome-scale targets partitioned
    across chips with halo exchange over ICI).  The target-position
    vectors — splice-site PSSM scores, factored match class indices,
    every O(T) input — live sharded, so a pair whose target outgrows
    one chip's memory spans the slice; the DP recurrence is unchanged
    and the result is exactly the single-device wavefront's."""
    n = int(np.prod([s for name, s in zip(mesh.axis_names, mesh.devices.shape)
                     if name == axis]) or 1)
    Qp = region.query_length
    Tp = _pad_to_multiple(region.target_length, max(n, 1))
    inputs, kinds = wavefront.prepare_inputs(model, region, data,
                                             pad_to=(Qp, Tp))
    fn = _sharded_fn(model, Qp, Tp, "region", kinds, mesh, axis,
                     Tp + 1)
    with mesh:
        out = jax.tree_util.tree_map(
            lambda x: np.asarray(x), fn(inputs))
    return DPResult(score=int(out["score"]),
                    query_end=int(out["query_end"]),
                    target_end=int(out["target_end"]),
                    query_start=int(out["query_start"]),
                    target_start=int(out["target_start"]))
