"""Sharded proving-step pipeline over the (row, col) mesh.

The per-phase data flow of Starks::genProof (src/starkpil/starks.cpp:53-60:
extendPol then merkelize) mapped onto a device mesh:

  LDE        row-sharded distributed four-step NTT (ntt_sharded.py): the
             transpose between butterfly passes is an explicit all_to_all
             inside shard_map — no GSPMD-chosen resharding anywhere.
  Merkle     leaf linear-hash needs whole rows -> already row-sharded, so
             hashing is device-local.
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

    Everything stays ROW-sharded: the LDE runs the distributed four-step
    NTT (explicit all_to_all inside shard_map, ntt_sharded.py), so the
    Poseidon leaf hashing that follows is row-local with NO resharding.
    Round 1 kept the LDE column-sharded and asked GSPMD to move col->row
    afterwards, which XLA satisfied by replicating the whole tensor (the
    "involuntary full rematerialization" warning) — fatal at 2^24x751.
    """
    from . import ntt_sharded as nsh

    row_s = NamedSharding(mesh, P("row", None))
    repl = NamedSharding(mesh, P())

    def step(cm):
        ext = nsh.extend_pol_sharded(cm, n_bits, n_bits_ext, mesh,
                                     axis="row", col_axis=None)
        leaves = pos.linear_hash(ext)
        n_row = mesh.shape["row"]
        while leaves.shape[0] > max(n_row, 1):
            leaves = pos.hash_level(leaves)
        leaves = jax.lax.with_sharding_constraint(leaves, repl)
        while leaves.shape[0] > 1:
            leaves = pos.hash_level(leaves)
        return leaves[0]

    return jax.jit(step, in_shardings=row_s, out_shardings=repl)
