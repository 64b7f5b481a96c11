"""Poseidon-GL device kernels vs the pure-Python model."""

import numpy as np
import jax.numpy as jnp

from zkevm_prover_tpu.ops import goldilocks as gl
from zkevm_prover_tpu.ops import poseidon_constants as pc
from zkevm_prover_tpu.ops import poseidon_gl as pos
from zkevm_prover_tpu.ops import refmodel as rm

P = gl.P


def _model():
    return rm.Poseidon(pc.round_constants(), pc.mds_matrix())


def test_permutation_vs_model():
    rng = np.random.default_rng(11)
    states = rng.integers(0, P, (9, 12), dtype=np.uint64)
    got = np.asarray(pos.permute(jnp.asarray(states)))
    m = _model()
    for i in range(9):
        want = m.permute([int(v) for v in states[i]])
        assert [int(v) for v in got[i]] == want


def test_permutation_zero_state():
    got = [int(v) for v in np.asarray(pos.permute(jnp.zeros((12,), jnp.uint64)))]
    want = _model().permute([0] * 12)
    assert got == want


def test_linear_hash_vs_model():
    m = _model()
    rng = np.random.default_rng(12)
    for width in [1, 4, 5, 8, 9, 16, 20]:
        rows = rng.integers(0, P, (6, width), dtype=np.uint64)
        got = np.asarray(pos.linear_hash(jnp.asarray(rows)))
        for i in range(6):
            want = m.linear_hash([int(v) for v in rows[i]])
            assert [int(v) for v in got[i]] == want, f"width={width}"


def test_hash_level_vs_model():
    m = _model()
    rng = np.random.default_rng(13)
    nodes = rng.integers(0, P, (8, 4), dtype=np.uint64)
    got = np.asarray(pos.hash_level(jnp.asarray(nodes)))
    for i in range(4):
        want = m.hash_pair(
            [int(v) for v in nodes[2 * i]], [int(v) for v in nodes[2 * i + 1]]
        )
        assert [int(v) for v in got[i]] == want


def test_constants_shape():
    assert len(pc.round_constants()) == 360
    M = pc.mds_matrix()
    assert len(M) == 12 and all(len(r) == 12 for r in M)
    # MDS must be invertible (necessary condition for MDS property)
    import numpy.linalg  # noqa
    # check over F_p via model: det != 0 by computing rank with row reduction
    rows = [list(r) for r in M]
    n = 12
    det = 1
    for c in range(n):
        piv = next((r for r in range(c, n) if rows[r][c] % P), None)
        assert piv is not None
        if piv != c:
            rows[c], rows[piv] = rows[piv], rows[c]
            det = P - det
        det = det * rows[c][c] % P
        invp = rm.inv(rows[c][c])
        for r in range(c + 1, n):
            f = rows[r][c] * invp % P
            rows[r] = [(rows[r][k] - f * rows[c][k]) % P for k in range(n)]
    assert det != 0
