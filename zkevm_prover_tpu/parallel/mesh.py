"""Device-mesh construction for the proving pipeline.

The proving mesh is 2-D: (`row`, `col`). `row` shards the domain (trace rows /
NTT coefficients), `col` shards committed columns. This replaces the
reference's intra-box OpenMP loops (SURVEY.md §2.6) with ICI collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor2(n: int) -> tuple[int, int]:
    """Split n into (rows, cols) as close to square as possible, rows >= cols."""
    c = int(np.floor(np.sqrt(n)))
    while n % c:
        c -= 1
    return max(n // c, c), min(n // c, c)


def make_mesh(devices=None, *, shape: tuple[int, int] | None = None,
              axis_names=("row", "col")) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = factor2(n)
    assert shape[0] * shape[1] == n, f"mesh shape {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("row", None))


def col_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, "col"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
