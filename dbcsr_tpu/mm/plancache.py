"""Plan cache for repeated one-shot multiplies.

Iterative callers that do not use ``build_multiply_executor`` still repeat
products over identical sparsity patterns (the perf driver's nrep loop, SCF
steps). The reference amortizes planning through its batched-mm state
machine (``dbcsr_tas_batched_mm_*``); here a small content-keyed LRU reuses
the symbolic product and the C index across calls. Keys are fingerprints of
the index CONTENT (pattern + block sizes), so the cache is safe across
object lifetimes and matrix data changes.

Filtered multiplies (filter_eps) are not cached at this level — their
surviving pattern depends on the data's norms.
"""
from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Optional, Tuple

import numpy as np

from ..block.index import BCSRIndex

__all__ = ["index_fingerprint", "PlanCache", "get_plan_cache"]

_CAPACITY = 64


def index_fingerprint(index: BCSRIndex) -> bytes:
    """Stable content hash of an index (cached on the index object)."""
    def mk():
        h = hashlib.blake2b(digest_size=16)
        h.update(index.row_block_sizes.tobytes())
        h.update(index.col_block_sizes.tobytes())
        h.update(index.row_ptr.tobytes())
        h.update(index.col_idx.tobytes())
        return h.digest()

    return index._cached("fingerprint", mk)


def array_fingerprint(*arrays) -> bytes:
    """Stable content hash over numpy arrays (distribution vectors etc.)."""
    import numpy as np

    h = hashlib.blake2b(digest_size=16)
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.digest()


def dist_fingerprint(dist) -> bytes:
    """Content hash of a Distribution (grid shape + row/col maps),
    cached on the object."""
    if getattr(dist, "_fingerprint", None) is None:
        g = dist.grid
        h = hashlib.blake2b(digest_size=16)
        h.update(bytes([g.nprow, g.npcol, g.nlayer]))
        # device identity: two grids with equal shape + dist maps but
        # different device sets/order must not share cached executors
        # (the executor closes over the mesh it was built on)
        h.update(
            np.asarray(
                [d.id for d in g.mesh.devices.flat], dtype=np.int64
            ).tobytes()
        )
        h.update(array_fingerprint(dist.row_dist, dist.col_dist))
        object.__setattr__(dist, "_fingerprint", h.digest())
    return dist._fingerprint


class PlanCache:
    def __init__(self, capacity: int = _CAPACITY):
        self._cap = capacity
        self._store: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def key(
        self, a_index: BCSRIndex, ta: bool, b_index: BCSRIndex, tb: bool,
        extra: Tuple = (),
    ) -> Tuple:
        return (
            index_fingerprint(a_index), ta, index_fingerprint(b_index), tb,
        ) + extra

    def get(self, key) -> Optional[object]:
        if key in self._store:
            self._store.move_to_end(key)
            self.hits += 1
            return self._store[key]
        self.misses += 1
        return None

    def put(self, key, value) -> None:
        self._store[key] = value
        self._store.move_to_end(key)
        while len(self._store) > self._cap:
            self._store.popitem(last=False)

    def clear(self) -> None:
        self._store.clear()
        self.hits = self.misses = 0


_cache = PlanCache()


def get_plan_cache() -> PlanCache:
    return _cache
