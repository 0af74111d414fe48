"""oatk-tpu: a TPU-native organelle genome assembly engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of c-zhou/oatk
(HiFi closed-syncmer sparse de Bruijn assembly -> HMM annotation ->
organelle classification and circular path search).

The compute-heavy stages (per-base syncmer scan, k-mer counting,
wavefront edit distance) run as vectorized XLA/Pallas programs over
batched, padded read tensors; the small-N graph stages (unitigging,
cleaning, path search) run on host NumPy, fed by device reductions.

Reference parity targets c-zhou/oatk @ 2025-02-25 (see SURVEY.md).
"""

__version__ = "0.1.0"

# 64-bit integers are required throughout (smer codes use up to 62 bits,
# Murmur k-mer hashes are 64-bit).  XLA:TPU emulates u64 with 32-bit pairs.
# Floats stay explicitly f32/f64 per use site; enabling x64 here only
# changes integer behavior for arrays we construct with explicit dtypes.
import jax as _jax

_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the syncmer kernels compile once per
# (batch, length-bucket) shape (~1-2 min on TPU); caching across
# processes makes repeat CLI invocations start in seconds.
import os as _os

_cache_dir = _os.environ.get("OATK_TPU_CACHE", "/tmp/oatk_tpu_jax_cache")
# CPU-only runs skip the cache: XLA:CPU persists AOT code whose machine
# features may not match a later host (it warns about possible SIGILL),
# and CPU compiles are cheap anyway.
if "cpu" not in _os.environ.get("JAX_PLATFORMS", "").lower():
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
