"""FRI commit/fold/query phase on device.

TPU-native counterpart of the reference's FRIProve (src/starkpil/fri/
friProve.cpp:5-180). The per-group INTT + coset rescale + Horner evaluation at
special_x is done for ALL groups at once as one batched tensor program
(reshape → vectorized INTT over the leading axis → scan-built scale table →
unrolled Horner), instead of one OpenMP thread per group.

Layer/tree layout matches the reference exactly:
  layer si has size 2^{steps[si]} and lives on the coset
  shift^(2^(nBitsExt - steps[si])) · <w_{steps[si]}>;
  tree si+1 commits layer si grouped so leaf g holds
  { layer_si[j * 2^{steps[si+1]} + g] : j }, i.e. the elements folding into
  position g of layer si+1 (friProve.cpp getTransposed + copySource).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gl3
from ..ops import goldilocks as gl
from ..ops import merkle
from ..ops import ntt as nttmod


def _pow_rows(base_per_col, n_rows):
    """T[j, g] = base_per_col[g]^j for j < n_rows (log-depth scan)."""
    n_cols = base_per_col.shape[0]
    x = jnp.concatenate(
        [jnp.ones((1, n_cols), jnp.uint64),
         jnp.broadcast_to(base_per_col[None, :], (n_rows - 1, n_cols))],
        axis=0,
    )
    return jax.lax.associative_scan(gl.mul, x, axis=0)


def fold_layer(values, fold_bits: int, special_x, shift_inv: int, w_inv: int,
               sinv_g=None):
    """Fold one FRI layer: (size, 3) -> (size >> fold_bits, 3).

    values live on coset s·<w_size> with s^-1 = shift_inv, w_size^-1 = w_inv.
    Per output position g: gather {values[i * out + g]}, INTT (size 2^fold_bits),
    rescale coefficient j by (shift_inv · w_inv^g)^j, evaluate at special_x.

    `sinv_g` (the (out,) table shift_inv * w_inv^g) can be passed as a
    runtime argument: built in-graph it is a 2^20+ associative scan whose
    compile blows past the AOT helper's memory (same failure mode as the
    phase-5 coset tables — pass big tables, don't embed them).
    """
    size = values.shape[0]
    n_x = 1 << fold_bits
    out = size >> fold_bits
    v = values.reshape(n_x, out, 3)
    coefs = nttmod.intt(v, fold_bits)  # vectorized over (out, 3)
    if sinv_g is None:
        sinv_g = gl.mul(geom(w_inv, out), jnp.uint64(shift_inv))  # (out,)
    scale = _pow_rows(sinv_g, n_x)  # (n_x, out)
    coefs = gl.mul(coefs, scale[..., None])
    acc = coefs[n_x - 1]
    for j in range(n_x - 2, -1, -1):  # Horner at special_x (ext)
        acc = gl3.add(gl3.mul(acc, jnp.broadcast_to(special_x, acc.shape)), coefs[j])
    return acc


def geom(base: int, n: int):
    return nttmod.geometric_powers(base, n)


def group_for_tree(layer, next_bits: int):
    """(size, 3) layer -> (2^next_bits, group*3) Merkle source rows."""
    n_groups = 1 << next_bits
    group = layer.shape[0] >> next_bits
    # row g holds [layer[g], layer[n_groups + g], layer[2*n_groups + g], ...]
    return jnp.transpose(layer.reshape(group, n_groups, 3), (1, 0, 2)).reshape(
        n_groups, group * 3
    )


@dataclasses.dataclass
class FriLayerCommit:
    tree: merkle.MerkleTree  # over group_for_tree of the PREVIOUS layer
    root: np.ndarray


def coset_shift_inv_at(step_idx: int, n_bits_ext: int, steps: list[int]) -> int:
    """shift^-(2^(nBitsExt - steps[step_idx-1])) — inverse coset shift of the
    layer being folded at iteration `step_idx` (friProve.cpp polShiftInv
    squaring schedule)."""
    e = 1 << (n_bits_ext - steps[step_idx - 1])
    return pow(gl.shift_inv(), e, gl.P)
