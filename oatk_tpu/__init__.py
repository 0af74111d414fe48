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

# Disable numpy's MADV_HUGEPAGE on large allocations.  On kernels where
# transparent hugepages are slow to fault/collapse (measured here: first
# touch of a THP-advised region runs ~150x slower than 4K pages -- 30 s
# vs 0.2 s per 200 MB), every fresh large array pays a massive hidden
# tax; the assembler's host stages are allocation-heavy (flat
# concatenations, read batches), so this single switch dominates
# end-to-end wall clock.  Runtime switch (not the NUMPY_MADVISE_HUGEPAGE
# env var) so it works regardless of import order.
if _os.environ.get("OATK_TPU_HUGEPAGE", "0") != "1":
    try:
        try:
            from numpy._core.multiarray import _set_madvise_hugepage as _smh
        except ImportError:  # pragma: no cover - numpy < 2
            from numpy.core.multiarray import _set_madvise_hugepage as _smh
        _smh(False)
    except Exception:  # pragma: no cover - private symbol moved/removed
        pass  # purely a perf tweak; never block the import

# Keep large allocations on the reusable brk heap.  On microVM kernels
# (Firecracker here) EVERY newly faulted anonymous page takes a host
# roundtrip -- measured 5-8 s/GB first touch, and parallel faulting is
# WORSE (41 s/GB across 4 threads).  glibc mmaps allocations above
# M_MMAP_THRESHOLD (128 KB default) and munmaps them on free, so each
# big numpy temporary re-pays the full fault cost; raising the
# threshold (and the trim threshold, so the heap top is not returned)
# makes freed pages reusable: repeat 800 MB alloc+touch drops 6.8 s ->
# 0.4 s.  Values are clamped to INT_MAX (mallopt takes int).
if _os.environ.get("OATK_TPU_MALLOC_REUSE", "1") == "1":
    try:
        import ctypes as _ct

        _libc = _ct.CDLL("libc.so.6")
        _libc.mallopt(-3, 0x7FFFFFFF)  # M_MMAP_THRESHOLD
        _libc.mallopt(-1, 0x7FFFFFFF)  # M_TRIM_THRESHOLD
    except Exception:  # pragma: no cover - non-glibc libc
        pass

_cache_dir = _os.environ.get("OATK_TPU_CACHE", "/tmp/oatk_tpu_jax_cache")
# CPU-only runs skip the cache: XLA:CPU persists AOT code whose machine
# features may not match a later host (it warns about possible SIGILL),
# and CPU compiles are cheap anyway.
if "cpu" not in _os.environ.get("JAX_PLATFORMS", "").lower():
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # The cache key hashes the module AFTER strip-debuginfo, but a
        # Pallas call embeds its Mosaic payload (locations included) in
        # a custom_call backend_config the pass cannot reach.  With full
        # tracebacks in locations, the CALLER chain (bench.py vs CLI vs
        # pipeline, even unrelated line-number shifts) leaks into the
        # payload and silently forks the cache key -- every entry point
        # then pays the ~80 s first-compile of the same kernel.  Keep
        # locations to the defining frame only.
        _jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
