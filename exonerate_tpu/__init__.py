"""exonerate_tpu — a TPU-native generic pairwise sequence-comparison framework.

A from-scratch reimplementation of the capabilities of exonerate
(G. Slater & E. Birney), designed TPU-first: alignment models are declarative
weighted finite-state automata (a model IR mirroring the reference C4 DSL,
ref: src/c4/c4.h:61-194) from which generic engines are derived:

- a NumPy reference interpreter (the correctness oracle, the analogue of
  Viterbi_interpreted, ref: src/c4/viterbi.c:655-837),
- a JAX anti-diagonal wavefront engine (jit/vmap/pjit; the analogue of the
  reference's generated-C DP kernels, ref: src/c4/viterbi.c:869-1758),
- Pallas TPU kernels for the hot 1:1 model family,
- seeded heuristics (word seeding + HSP extension + banded gapped extension,
  the analogue of seeder/hspset/sdp).

Scores are int32 everywhere; outputs aim for byte parity with the reference.
"""

__version__ = "0.1.0"

IMPOSSIBLY_LOW_SCORE = -987654321   # ref: src/c4/c4.h:29
IMPOSSIBLY_HIGH_SCORE = 987654321   # ref: src/c4/c4.h:30


def _apply_platform_override():
    """Honor EXONERATE_TPU_PLATFORM=cpu|tpu in subprocesses (the axon
    TPU plugin ignores JAX_PLATFORMS, so tests/fuzzers that shell out to
    the CLI need a package-level override applied before any backend is
    initialized)."""
    import os
    plat = os.environ.get("EXONERATE_TPU_PLATFORM")
    if plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass


_apply_platform_override()


def enable_compilation_cache():
    """Point JAX at a persistent compilation cache so kernel compiles
    (minutes for fresh Pallas shapes) survive across processes — the
    runtime analogue of the reference bootstrapper's compiled-model
    archive (ref: src/model/bootstrapper.c:412-428).  Called by the CLI
    entry points; honors JAX_COMPILATION_CACHE_DIR if the user set it."""
    import os
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "exonerate_tpu", "xla")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # locus workloads generate many ~2-5 s traces (bucket shapes x
        # batch sizes x masked variants); a 5 s floor excluded nearly
        # all of them from the cache, recompiling every run
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.2)
    except Exception:
        pass
