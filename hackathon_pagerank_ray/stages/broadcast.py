"""Worker-side broadcast-object cache.

``ray.get`` of a plasma object that pickles WITHOUT out-of-band buffers
(a plain dict, a list of strings) re-runs the unpickle on every call —
near the 5M-entry broadcast thresholds used across this repo that is a
~0.5 GB dict rebuild per ``map_batches`` invocation.  ``cached_get``
memoizes the deserialized value once per worker process, keyed on the
ObjectRef hex, so each worker pays the unpickle exactly once per
broadcast object (numpy arrays don't need this: they come back zero-copy
from plasma).

The cache is process-global and unbounded by design: broadcast objects
are small-side lookups already gated by explicit ``broadcast_max_*``
thresholds at every call site, and worker processes are recycled per
job, so entries die with the worker.
"""

_OBJ_CACHE: dict = {}


def cached_get(ref):
    """Memoized ``ray.get(ref)`` — one deserialization per worker process
    per object (ADVICE r4: raw per-batch ``ray.get`` of a pickled dict
    re-deserializes on every map_batches call)."""
    key = ref.hex()
    got = _OBJ_CACHE.get(key)
    if got is None:
        import ray
        got = _OBJ_CACHE[key] = ray.get(ref)
    return got
