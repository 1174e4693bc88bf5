"""glibc allocator tuning for lazily-paged hosts.

On hypervisors that provision guest memory lazily, the first touch of a
freshly mmap'd region runs at ~100 MB/s — orders of magnitude below the
warm-page bandwidth — so every large numpy temporary repays the
page-fault tax and a vectorized kernel can spend 10× its compute time
faulting pages in.  glibc's default malloc returns blocks above
M_MMAP_THRESHOLD straight to the OS on free, which makes the tax
recurring.  Forcing sbrk-heap allocation (M_MMAP_MAX=0) with a huge trim
threshold keeps freed pages resident, so each process pays first-touch
once per high-water mark instead of once per temporary.

Call :func:`tune_allocator` early in any process that runs large numpy
kernels (driver, bench, and inside hot Ray task/actor functions — it is
idempotent and costs microseconds after the first call).  Exporting the
``MALLOC_*`` env vars additionally covers Ray workers forked after the
driver sets them.  Silently a no-op on non-glibc platforms.
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_MAX = -4

_done = False


def tune_allocator() -> None:
    global _done
    if _done:
        return
    _done = True
    # inherited by raylet/workers spawned after this point
    os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str((1 << 31) - 1))
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(ctypes.c_int(_M_MMAP_MAX), ctypes.c_int(0))
        libc.mallopt(ctypes.c_int(_M_TRIM_THRESHOLD),
                     ctypes.c_int((1 << 31) - 1))
    except Exception:
        pass
