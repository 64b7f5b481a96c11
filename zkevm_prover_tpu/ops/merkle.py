"""Poseidon Merkle trees over Goldilocks (arity 2) on device.

TPU-native replacement for the reference's `MerkleTreeGL`
(src/starkpil/merkleTree/merkleTreeGL.cpp: merkelize() via
PoseidonGoldilocks::merkletree_avx, getGroupProof() row + sibling path).
The whole tree is built as a chain of batched Poseidon levels on the
device; proofs are extracted with tiny host gathers (queries are ~64 paths
per proof — negligible traffic), mirroring the reference's query phase.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import poseidon_gl as pos

HASH_SIZE = pos.HASH_SIZE


def merkelize_levels(source):
    """Build all tree levels for a (H, W) source; H must be a power of 2.

    Returns [leaves (H,4), ..., root_level (1,4)].
    """
    h = source.shape[0]
    assert h & (h - 1) == 0, "height must be a power of two"
    levels = [pos.linear_hash(source)]
    while levels[-1].shape[0] > 1:
        levels.append(pos.hash_level(levels[-1]))
    return levels


@functools.lru_cache(maxsize=None)
def _merkelize_jit(h: int, w: int):
    """One jitted program for the whole tree per (H, W) shape — building
    levels eagerly costs one XLA compile PER LEVEL on every new shape."""
    return jax.jit(merkelize_levels)


# leaf-hash column block for big sources (a RATE multiple): each block is
# its own XLA program, so the permutation custom-call buffers of one
# program cover only LEAF_COLS/RATE chunks — a fused 751-column leaf hash
# otherwise holds ~95 pallas buffers at once and exhausts HBM alongside
# the resident proof sections
LEAF_COLS = 64
_BIG_LEAF_ELEMS = 1 << 24   # chunk only when H*W is actually big


@functools.lru_cache(maxsize=None)
def _leaf_fold_jit(h: int, w: int):
    return jax.jit(pos.linear_hash_fold)


@functools.lru_cache(maxsize=None)
def _levels_jit(h: int):
    def run(leaves):
        levels = [leaves]
        while levels[-1].shape[0] > 1:
            levels.append(pos.hash_level(levels[-1]))
        return levels

    return jax.jit(run)


@dataclasses.dataclass
class MerkleTree:
    """Committed source + hash levels. `source` layout is (height, width)."""

    source: jax.Array          # (H, W) uint64
    levels: list               # [(H,4), (H/2,4), ..., (1,4)]
    _host: dict = dataclasses.field(default_factory=dict, repr=False)

    @classmethod
    def commit(cls, source) -> "MerkleTree":
        import os

        h, w = source.shape
        dbg = os.environ.get("ZK_MEMDEBUG")
        # The column-chunked fold exists for XLA:CPU, where one fused
        # leaf-hash program's LOCAL compile (and its pallas-buffer-dense
        # execution arena) scales with W. On TPU the compile is remote
        # and the fused program's working set fits HBM — and the chunked
        # path's allocation churn (eager slices + one program per block)
        # floods the axon session's async dealloc queue.
        on_cpu = jax.default_backend() == "cpu"
        if on_cpu and w > LEAF_COLS and h * w >= _BIG_LEAF_ELEMS:
            digest = jnp.zeros((h, HASH_SIZE), dtype=jnp.uint64)
            for off in range(0, w, LEAF_COLS):
                if dbg:
                    live = sum(a.nbytes for a in jax.live_arrays())
                    print(f"[mem] commit({h}x{w}) off={off} "
                          f"live={live/1e9:.2f} GB "
                          f"({len(jax.live_arrays())} arrays)", flush=True)
                blk = source[:, off:off + LEAF_COLS]
                digest = _leaf_fold_jit(h, blk.shape[1])(blk, digest)
            levels = _levels_jit(h)(digest)
            return cls(source=source, levels=levels)
        levels = _merkelize_jit(*source.shape)(source)
        return cls(source=source, levels=levels)

    @property
    def height(self) -> int:
        return self.source.shape[0]

    @property
    def width(self) -> int:
        return self.source.shape[1]

    def root(self) -> np.ndarray:
        return np.asarray(self.levels[-1][0])

    def proof_length(self) -> int:
        return len(self.levels) - 1

    def _host_arrays(self):
        """One device->host transfer per tree; per-query device slicing with
        python ints would compile a fresh XLA gather per index value."""
        if not self._host:
            self._host["source"] = np.asarray(self.source)
            self._host["levels"] = [np.asarray(l) for l in self.levels]
        return self._host

    def get_group_proof(self, idx: int):
        """Row values + sibling path for leaf `idx` (host-side extraction)."""
        h = self._host_arrays()
        row = h["source"][idx]
        siblings = []
        i = idx
        for lvl in h["levels"][:-1]:
            siblings.append(lvl[i ^ 1])
            i >>= 1
        return row, np.stack(siblings) if siblings else np.zeros((0, HASH_SIZE), np.uint64)


def verify_group_proof(root, idx: int, row, siblings, hasher=None) -> bool:
    """Host-side proof check (verifier oracle). `hasher` = refmodel.Poseidon."""
    if hasher is None:
        from . import poseidon_constants as pc
        from . import refmodel as rm

        hasher = rm.Poseidon(pc.round_constants(), pc.mds_matrix())
    node = hasher.linear_hash([int(v) for v in row])
    i = idx
    for sib in siblings:
        s = [int(v) for v in sib]
        node = hasher.hash_pair(node, s) if i % 2 == 0 else hasher.hash_pair(s, node)
        i >>= 1
    return node == [int(v) for v in root]
