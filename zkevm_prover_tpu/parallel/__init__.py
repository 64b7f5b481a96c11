"""Multi-chip parallelism (L-distributed) — mesh/sharding utilities.

The reference scales out via OpenMP threads inside one box and gRPC across
boxes (SURVEY.md §2.6 "parallelism strategies"); a single proof never spans
hosts. The TPU build shards a SINGLE proof across a device mesh:

  * columns of the trace across the `col` mesh axis (the analogue of the
    reference's column-blocked OpenMP LDE, embarrassingly parallel),
  * rows across the `row` mesh axis for the four-step NTT (all-to-all
    between butterfly stages) and for Merkle leaf hashing,
  * XLA/GSPMD inserts the column→row resharding between LDE and hashing.

Modules:
  mesh         — mesh construction helpers
  ntt_sharded  — distributed four-step NTT/INTT (shard_map + all_to_all)
  pipeline     — sharded commit step (LDE + Merkle) used by the prover
"""

from . import mesh, ntt_sharded, pipeline  # noqa: F401
