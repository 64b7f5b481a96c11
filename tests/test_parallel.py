"""Multi-chip sharding on the 8-device virtual CPU mesh.

Validates what the driver's dryrun_multichip exercises: the distributed
four-step NTT (shard_map + all_to_all between butterfly stages) is bit-exact
vs the single-chip path, and the sharded commit step (column-sharded LDE ->
row-sharded Merkle) reproduces the unsharded root."""

import jax
import numpy as np
import pytest

from zkevm_prover_tpu.ops import goldilocks as gl
from zkevm_prover_tpu.ops import ntt as nttmod
from zkevm_prover_tpu.parallel import mesh as meshmod
from zkevm_prover_tpu.parallel import ntt_sharded, pipeline

N_BITS = 8
N_COLS = 8


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return meshmod.make_mesh(jax.devices()[:8])


def _trace(n_bits=N_BITS, n_cols=N_COLS, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, gl.P, size=(1 << n_bits, n_cols), dtype=np.uint64)


def test_mesh_factoring():
    assert meshmod.factor2(8) == (4, 2)
    assert meshmod.factor2(16) == (4, 4)
    assert meshmod.factor2(7) == (7, 1)


def test_sharded_ntt_bit_exact(mesh):
    x = _trace()
    xs = jax.device_put(x, meshmod.col_sharding(mesh))
    got = jax.jit(lambda v: ntt_sharded.ntt_sharded(v, mesh, n_bits=N_BITS))(xs)
    want = jax.jit(lambda v: nttmod.ntt(v, N_BITS))(x)
    assert (np.asarray(got) == np.asarray(want)).all()


def test_sharded_intt_bit_exact(mesh):
    x = _trace(seed=1)
    xs = jax.device_put(x, meshmod.col_sharding(mesh))
    got = jax.jit(
        lambda v: ntt_sharded.ntt_sharded(v, mesh, n_bits=N_BITS, inverse=True)
    )(xs)
    want = jax.jit(lambda v: nttmod.intt(v, N_BITS))(x)
    assert (np.asarray(got) == np.asarray(want)).all()


def test_sharded_extend_pol_bit_exact(mesh):
    x = _trace(seed=2)
    xs = jax.device_put(x, meshmod.col_sharding(mesh))
    got = jax.jit(
        lambda v: ntt_sharded.extend_pol_sharded(v, N_BITS, N_BITS + 1, mesh)
    )(xs)
    want = jax.jit(lambda v: nttmod.extend_pol(v, N_BITS, N_BITS + 1))(x)
    assert (np.asarray(got) == np.asarray(want)).all()


def test_sharded_commit_step_matches_unsharded(mesh):
    x = _trace(seed=3)
    step = pipeline.commit_step_sharded(mesh, N_BITS, N_BITS + 1)
    root_sharded = np.asarray(step(jax.device_put(x, meshmod.row_sharding(mesh))))
    root_plain = np.asarray(
        jax.jit(lambda v: pipeline.commit_step(v, N_BITS, N_BITS + 1))(x)
    )
    assert (root_sharded == root_plain).all()


def test_meshed_prover_bit_identical():
    """A full StarkProver.prove on an 8-way 1-D mesh produces the SAME
    proof bytes as single-chip — LDEs run the distributed four-step NTT,
    every other phase partitions row-locally (no involuntary resharding).
    """
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    from zkevm_prover_tpu.stark import expr as ex
    from zkevm_prover_tpu.stark.air import AIR
    from zkevm_prover_tpu.stark.prover import StarkProver
    from zkevm_prover_tpu.stark.setup import StarkSetup
    from zkevm_prover_tpu.stark.verifier import verify

    nb = 8
    n = 1 << nb
    rng = np.random.default_rng(11)

    def build_air():
        # one of each argument kind so every prover phase engages
        air = AIR("mp", nb)
        a, b, f = air.committed("a", "b", "f")
        table = air.constant("T", np.arange(n, dtype=np.uint64) * 5)
        not_last = np.ones(n, dtype=np.uint64)
        not_last[n - 1] = 0
        nl = air.constant("NL", not_last)
        air.require_zero(nl * (ex.Cm(a.id, True) - a - b))
        air.lookup([f], [table])
        air.permutation([b], [b])
        return air

    tr_a = np.zeros(n, dtype=np.uint64)
    tr_b = rng.integers(0, gl.P, n, dtype=np.uint64)
    for i in range(n - 1):
        tr_a[i + 1] = (int(tr_a[i]) + int(tr_b[i])) % gl.P
    tr_f = rng.integers(0, n, n).astype(np.uint64) * 5
    trace = np.stack([tr_a, tr_b, tr_f], axis=1)

    plain = StarkProver(StarkSetup(build_air(), n_queries=8,
                                   fri_fold_bits=2))
    p_plain = plain.prove(trace)

    mesh1d = Mesh(np.array(jax.devices()[:8]), ("row",))
    meshed = StarkProver(StarkSetup(build_air(), n_queries=8,
                                    fri_fold_bits=2), mesh=mesh1d)
    p_mesh = meshed.prove(trace)

    assert all(np.array_equal(a, b) for a, b in zip(p_mesh.roots, p_plain.roots))
    assert list(p_mesh.evals) == list(p_plain.evals)
    assert (p_mesh.final_pol == p_plain.final_pol).all()
    assert verify(meshed.setup, meshed.verkey, p_mesh)
