"""Distributed four-step NTT over a mesh axis (shard_map + all_to_all).

The single-chip NTT (ops/ntt.py) already uses the four-step factorization
N = N1·N2; here the transpose between the two butterfly passes becomes an
`all_to_all` over ICI — the multi-chip decomposition called for by the north
star (BASELINE.json: "sharded limb/coefficient-wise across a pod slice with
all-to-all exchanges between butterfly stages"). Reference counterpart: the
column-blocked OpenMP NTT_Goldilocks (absent submodule; call sites
src/starkpil/starks.cpp:53,134,215) — which never crosses a host.

Data layout contract:
  input  x: (N, C) uint64, natural order, sharded (or shardable) so that the
            reshape (N1, N2, C) places the i2 axis across `axis`;
  output X: (N, C) natural order, X[k] = sum_i x[i] w^{ik}.

Internally each device holds an (N1, N2/D, C) brick:
  1. local column NTTs over i1 (root w_N1),
  2. local outer twiddles w^{k1·i2} (i2 = global index),
  3. all_to_all: (N1, N2/D, C) -> (N1/D, N2, C)  [the transpose],
  4. local row NTTs over i2 (root w_N2),
output brick (N2, N1/D, C) = natural-order global (N2, N1, C) sharded on k1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..ops import goldilocks as gl
from ..ops import ntt as nttmod


def _pow_rows(base_per_col, n_rows):
    """T[j, g] = base_per_col[g]^j (log-depth scan over axis 0)."""
    n_cols = base_per_col.shape[0]
    x = jnp.concatenate(
        [jnp.ones((1, n_cols), jnp.uint64),
         jnp.broadcast_to(base_per_col[None, :], (n_rows - 1, n_cols))],
        axis=0,
    )
    return jax.lax.associative_scan(gl.mul, x, axis=0)


def _four_step_local(x_brick, *, b1: int, b2: int, root: int, n_devs: int,
                     axis: str):
    """Per-device body: x_brick (N1, N2/D, C) -> (N2, N1/D, C)."""
    n1, n2 = 1 << b1, 1 << b2
    n2l = n2 // n_devs
    d = jax.lax.axis_index(axis)

    # 1. column NTTs over i1
    y = nttmod._ntt_root(x_brick, b1, pow(root, n2, gl.P))

    # 2. outer twiddles w^{k1·i2}, i2 global = d·n2l + i2_local.
    #    c[i2l] = root^{i2_global}; column i2l is geometric in k1 with ratio c.
    dev_base = jnp.asarray(
        np.array([pow(root, dd * n2l, gl.P) for dd in range(n_devs)], np.uint64)
    )[d]
    c = gl.mul(nttmod.geometric_powers(root, n2l), dev_base)  # (n2l,)
    tw = _pow_rows(c, n1)  # (n1, n2l)
    z = gl.mul(y, tw[..., None] if x_brick.ndim == 3 else tw)

    # 3. transpose via all_to_all: (N1, N2/D, C) -> (N1/D, N2, C)
    z = jax.lax.all_to_all(z, axis, split_axis=0, concat_axis=1, tiled=True)

    # 4. row NTTs over i2: move i2 to the front
    z = jnp.moveaxis(z, 1, 0)  # (N2, N1/D, C)
    t = nttmod._ntt_root(z, b2, pow(root, n1, gl.P))
    return t  # natural order: global (N2, N1, C), k = k1 + N1·k2


def ntt_sharded(x, mesh: Mesh, *, axis: str = "row", n_bits: int | None = None,
                inverse: bool = False, col_axis: str | None = "col"):
    """Distributed NTT/INTT along axis 0 of x (N, C) over mesh[axis].

    Columns additionally ride mesh[col_axis] if given. Returns natural order.
    """
    if n_bits is None:
        n_bits = int(x.shape[0]).bit_length() - 1
    n = 1 << n_bits
    assert x.shape[0] == n
    d = mesh.shape[axis]
    root = gl.w(n_bits)
    if inverse:
        root = pow(root, gl.P - 2, gl.P)
    b1 = n_bits // 2
    # both N1 (all_to_all split) and N2 (input shard) must divide by D
    while (1 << b1) % d:
        b1 += 1
    b2 = n_bits - b1
    assert (1 << b2) % d == 0, f"domain 2^{n_bits} too small for {d}-way shard"

    cspec = col_axis if (col_axis and x.ndim > 1 and mesh.shape.get(col_axis, 1) > 1
                         and x.shape[1] % mesh.shape[col_axis] == 0) else None
    spec = P(None, axis, cspec) if x.ndim == 2 else P(None, axis)

    body = functools.partial(_four_step_local, b1=b1, b2=b2, root=root,
                             n_devs=d, axis=axis)
    xr = x.reshape(1 << b1, 1 << b2, *x.shape[1:])
    run = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                    check_vma=False)
    t = run(xr)  # (N2, N1, C) natural order on reshape
    out = t.reshape(n, *x.shape[1:])
    if inverse:
        out = gl.mul(out, jnp.uint64(pow(n, gl.P - 2, gl.P)))
    return out


def extend_pol_sharded(evals, n_bits: int, n_bits_ext: int, mesh: Mesh, *,
                       axis: str = "row", shift: int | None = None,
                       col_axis: str | None = "col"):
    """Distributed low-degree extension (NTT_Goldilocks::extendPol shape):
    INTT on the trace domain -> coefficient coset scale -> zero-pad ->
    forward NTT on the extended domain, all row-sharded over mesh[axis]."""
    if shift is None:
        shift = gl.shift()
    n = 1 << n_bits
    coefs = ntt_sharded(evals, mesh, axis=axis, n_bits=n_bits, inverse=True,
                        col_axis=col_axis)
    spow = nttmod.geometric_powers(shift, n).reshape(
        (n,) + (1,) * (evals.ndim - 1))
    coefs = gl.mul(coefs, spow)
    pad = jnp.zeros(((1 << n_bits_ext) - n, *evals.shape[1:]), jnp.uint64)
    coefs = jnp.concatenate([coefs, pad], axis=0)
    return ntt_sharded(coefs, mesh, axis=axis, n_bits=n_bits_ext,
                       col_axis=col_axis)
