"""Runtime glue for running inside an externally-initialised Ray session.

The driver calls ``ray.init`` itself (possibly from a cwd where this repo is
not importable) before importing ``__ray_entry__``.  Ray workers then
deserialize our stage callables by module reference — which fails if the
worker processes can't import ``bano_ray``.  :func:`ensure_worker_importable`
registers every loaded ``bano_ray`` module for by-value cloudpickle
serialization, so stage code travels with the task instead of requiring a
worker-side install.  Idempotent; call after importing the modules a
pipeline uses.
"""

from __future__ import annotations

import sys

_registered: set[str] = set()
_malloc_tuned = False


def tune_malloc() -> None:
    """Keep numpy's large buffers on the retained glibc heap instead of
    per-allocation mmap/munmap.

    glibc serves allocations above M_MMAP_THRESHOLD (128 KB default) with a
    fresh mmap and returns them with munmap — so every large numpy
    temporary page-faults on first touch, and the kernel's zero-page fault
    path serializes under many concurrent workers.  Measured on this box:
    the same 8000-image pixel synthesis takes ~5 s per process with a warm
    retained heap versus ~184 s when 16 processes fault fresh pages
    concurrently.  Raising the threshold keeps big buffers in the arena,
    where freed memory is reused without new faults.  Per-process,
    idempotent; call at the top of numpy-heavy worker stages."""
    global _malloc_tuned
    if _malloc_tuned:
        return
    _malloc_tuned = True
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 28)
    except Exception:  # non-glibc platforms: nothing to tune
        pass


def ensure_worker_importable() -> None:
    try:
        from ray import cloudpickle as rcp
    except Exception:  # pragma: no cover - ray always present in this env
        return
    for name, mod in list(sys.modules.items()):
        if mod is not None and name.split(".")[0] == "bano_ray" and name not in _registered:
            try:
                rcp.register_pickle_by_value(mod)
                _registered.add(name)
            except Exception:
                pass
    _configure_data_context()


def _configure_data_context() -> None:
    """Streaming-executor fix: ray 2.49's operator resource reservation (a
    fraction of slots held back for downstream / all-to-all operators)
    starves long fused map chains at EVERY cluster size for this engine's
    workloads — measured 315 s of remote map work spread over 327 s of wall
    at 8 CPUs (~1 concurrent task), and effective parallelism ~12 of 32
    slots on the 38.4M-row flagship chain (502 s of remote wall spread over
    40.7 s; disabling cut the job 55 s → 37 s at 32 CPUs, quiet canaries
    both).  Our all-to-alls are tiny (pre-aggregated partials), so the
    reservation protects nothing here.  ``GRAFT_OP_RESERVATION=1`` restores
    the ray default for A/B measurement."""
    import os

    if os.environ.get("GRAFT_OP_RESERVATION") == "1":
        return
    try:
        import ray
        import ray.data

        if not ray.is_initialized():
            return
        ray.data.DataContext.get_current().op_resource_reservation_enabled = False
    except Exception:
        pass
