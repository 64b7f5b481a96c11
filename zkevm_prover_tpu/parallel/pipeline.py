"""Sharded proving-step pipeline over the (row, col) mesh.

The per-phase data flow of Starks::genProof (src/starkpil/starks.cpp:53-60:
extendPol then merkelize) mapped onto a device mesh:

  LDE        columns are independent -> column-sharded (mesh axis `col`);
             the row-axis NTT of each column stays on one device group.
  Merkle     leaf linear-hash needs whole rows -> row-sharded (axis `row`);
             GSPMD inserts the col->row resharding (an all-to-all) between
             the two, which is exactly the transpose the four-step NTT
             would do by hand.
  reduce     tree levels halve until they are smaller than the row shard;
             the tail runs replicated (it is log(N) tiny hashes).

`commit_step` is the jittable unit the driver dry-runs multi-chip; the
single-chip prover (stark/prover.py) calls the same ops unsharded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import goldilocks as gl
from ..ops import ntt as nttmod
from ..ops import poseidon_gl as pos


def commit_step(cm, n_bits: int, n_bits_ext: int):
    """LDE + Merkle root of a (N, C) trace block. Call under jit with
    sharding constraints from `commit_step_sharded`."""
    ext = nttmod.extend_pol(cm, n_bits, n_bits_ext)
    leaves = pos.linear_hash(ext)
    while leaves.shape[0] > 1:
        leaves = pos.hash_level(leaves)
    return leaves[0]


def commit_step_sharded(mesh: Mesh, n_bits: int, n_bits_ext: int):
    """Build the jitted multi-chip commit step for the given mesh.

    Input (N, C) arrives column-sharded; the LDE output is constrained
    column-sharded, then re-constrained row-sharded before hashing so XLA
    places the resharding collective between NTT and Poseidon.
    """
    col_s = NamedSharding(mesh, P(None, "col"))
    row_s = NamedSharding(mesh, P("row", None))
    repl = NamedSharding(mesh, P())

    def step(cm):
        ext = nttmod.extend_pol(cm, n_bits, n_bits_ext)
        ext = jax.lax.with_sharding_constraint(ext, col_s)
        ext = jax.lax.with_sharding_constraint(ext, row_s)
        leaves = pos.linear_hash(ext)
        n_row = mesh.shape["row"]
        while leaves.shape[0] > max(n_row, 1):
            leaves = pos.hash_level(leaves)
        leaves = jax.lax.with_sharding_constraint(leaves, repl)
        while leaves.shape[0] > 1:
            leaves = pos.hash_level(leaves)
        return leaves[0]

    return jax.jit(step, in_shardings=col_s, out_shardings=repl)
