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
                mesh: Mesh, axis: str):
    key = (id(model), Q, T, mode, kinds, id(mesh), axis)
    if key not in _CACHE:
        fn = wavefront.build_wavefront(model, Q, T, mode, kinds)
        qsharding = NamedSharding(mesh, P(axis))

        def run(inputs):
            # pin query-axis arrays to the 'sp' slabs; SPMD propagation
            # shards the scan carries to match and inserts the
            # roll-permutes
            pinned = {}
            for k, v in inputs.items():
                if hasattr(v, "ndim") and getattr(v, "ndim", 0) == 1 \
                        and v.shape[0] == Q + 1:
                    pinned[k] = jax.lax.with_sharding_constraint(
                        jax.numpy.asarray(v), qsharding)
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
    fn = _sharded_fn(model, Qp, Tp, "region", kinds, mesh, axis)
    with mesh:
        out = jax.tree_util.tree_map(
            lambda x: np.asarray(x), fn(inputs))
    return DPResult(score=int(out["score"]),
                    query_end=int(out["query_end"]),
                    target_end=int(out["target_end"]),
                    query_start=int(out["query_start"]),
                    target_start=int(out["target_start"]))
