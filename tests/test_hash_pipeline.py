"""Keccak hash pipeline — Main -> PaddingKK -> HashBit -> Bits2Field ->
KeccakF, fully bound in one combined AIR.

Reference surface: main.pil's hashK/hashKLen/hashKDigest lookups,
src/sm/padding_kk(+_bit)/, bits2field_executor.cpp, keccak_f_executor.cpp.
The satisfaction test proves a ROM that writes/reads two hash streams; the
forgery tests tamper with single layers while keeping them internally
consistent, so only the cross-SM bindings can object.
"""

import numpy as np
import pytest

from zkevm_prover_tpu.executor import combined
from zkevm_prover_tpu.executor.rom import RomBuilder
from zkevm_prover_tpu.executor.sm import bits2field, hash_bit
from zkevm_prover_tpu.executor.sm import keccak_circuit as kc
from zkevm_prover_tpu.executor.sm import padding_kk
from zkevm_prover_tpu.ops import keccak as keccak_mod
from zkevm_prover_tpu.stark.prover import StarkProver
from zkevm_prover_tpu.stark.setup import StarkSetup

N_BITS = 13     # one reduced-round keccak slot (8002 rows) + margin
ROUNDS = 1
PACK = 4
LIMB_BITS = 2

_cache: dict = {}


def _cfg():
    if "cfg" not in _cache:
        _cache["cfg"] = combined.keccak_pipeline_cfg(
            kc.build(ROUNDS), PACK, LIMB_BITS)
    return _cache["cfg"]


INCLUDE = ("keccak",)


def _rom():
    if "rom" not in _cache:
        rb = RomBuilder()
        # hash @0x100: a 5-byte write, a 1-byte write, len, digest read
        rb.line(CONST=5, setD=1)
        rb.line("0x68656C6C6F :HASHK(0x100)",
                CONSTL=int.from_bytes(b"hello", "big"), hashK=1,
                offset=0x100)
        rb.line("0x21 :HASHK1(0x100)", CONSTL=0x21, hashK1=1, offset=0x100)
        rb.line("6 :HASHKLEN(0x100)", CONSTL=6, hashKLen=1, offset=0x100)
        rb.line("$ => A :HASHKDIGEST(0x100)", inFREE=1, hashKDigest=1,
                offset=0x100, setA=1)
        # hash @0x200: empty message
        rb.line("0 :HASHKLEN(0x200)", CONSTL=0, hashKLen=1, offset=0x200)
        rb.line("$ => B :HASHKDIGEST(0x200)", inFREE=1, hashKDigest=1,
                offset=0x200, setB=1)
        rb.clear_registers()
        rb.finalize()
        _cache["rom"] = rb.build()
    return _cache["rom"]


def _air():
    if "air" not in _cache:
        _cache["air"] = combined.build_batch_air(
            _rom(), N_BITS, include=INCLUDE, keccak_cfg=_cfg())
    return _cache["air"]


def _prover():
    if "p" not in _cache:
        _cache["p"] = StarkProver(StarkSetup(
            _air(), n_queries=8, fri_fold_bits=2))
    return _cache["p"]


def _run():
    if "run" not in _cache:
        _cache["run"] = combined.execute_batch(
            _rom(), N_BITS, include=INCLUDE, keccak_cfg=_cfg())
    return _cache["run"]


def test_hash_bit_digest_matches_real_keccak():
    """With the production permutation, HashBit's digest limbs are the
    keccak-256 scalar's 32-bit limbs."""
    lay = hash_bit.keccak_layout()
    data = b"abc"
    padded = bytearray(data) + bytearray(136 - len(data))
    padded[len(data)] |= 0x01
    padded[-1] |= 0x80
    _, dlimbs, _ = hash_bit.execute(
        [{"bytes": bytes(padded), "first": True}], 11, lay,
        combined._host_keccak_perm)
    want = int.from_bytes(keccak_mod.keccak256(data), "big")
    got = sum(l << (32 * i) for i, l in enumerate(dlimbs[0]))
    assert got == want


def test_sponge_digest_helper_matches_real_keccak():
    lay = hash_bit.keccak_layout()
    for msg in (b"", b"hello!", bytes(range(200))):
        assert combined._sponge_digest(
            msg, lay, combined._host_keccak_perm) \
            == int.from_bytes(keccak_mod.keccak256(msg), "big")


def test_keccak_pipeline_satisfied():
    res, traces = _run()
    assert len(res.actions.keccak) == 2
    stacked = _air().stack_traces(traces)
    bad = _prover().check_constraints(stacked, quick=True)
    assert bad == [], f"violated constraints: {bad}"


def test_keccak_pipeline_rejects_forged_digest():
    """Tamper with the padding SM's digest limbs (held consistently over
    the message) — the padding->bit digest lookup must object."""
    res, traces = _run()
    forged = traces["padding_kk"].copy()
    ci = {nm: i for i, nm in enumerate(padding_kk.COLS)}
    # flip a digest limb across the first message's rows
    rows = forged[:, ci["ADDR"]] == 0x100
    forged[rows, ci["DG3"]] ^= 1
    stacked = _air().stack_traces({**traces, "padding_kk": forged})
    assert _prover().check_constraints(stacked, quick=True) != [], \
        "combined AIR must reject a forged padding digest"


def test_keccak_pipeline_rejects_forged_stream_byte():
    """Rebuild the padding trace from tampered message bytes (internally
    consistent padding stream, original digest columns restored) — the
    chunk-value lookup from Main and the byte decomposition into HashBit
    must object: the bit side still proves the real absorb."""
    res, traces = _run()
    acts = [dict(a) for a in res.actions.keccak]
    tampered = bytearray(acts[0]["data"])
    tampered[0] ^= 0x40
    acts[0]["data"] = bytes(tampered)
    n_cov = ((1 << N_BITS) // _cfg()["circ"].n_rows) * PACK
    forged, _, _ = padding_kk.execute(acts, N_BITS, n_cov)
    ci = {nm: i for i, nm in enumerate(padding_kk.COLS)}
    for l in range(8):  # silence the digest layers: keep the real limbs
        forged[:, ci[f"DG{l}"]] = traces["padding_kk"][:, ci[f"DG{l}"]]
    stacked = _air().stack_traces({**traces, "padding_kk": forged})
    assert _prover().check_constraints(stacked, quick=True) != [], \
        "combined AIR must reject a forged stream byte"


SHA_NB = 13


def _sha_cfg():
    if "scfg" not in _cache:
        from zkevm_prover_tpu.executor.sm import sha256_circuit

        _cache["scfg"] = combined.keccak_pipeline_cfg(
            sha256_circuit.build(1), PACK, LIMB_BITS)
    return _cache["scfg"]


def _sha_rom():
    if "srom" not in _cache:
        rb = RomBuilder()
        rb.line(CONST=4, setD=1)
        rb.line("0xDEADBEEF :HASHS(0x40)",
                CONSTL=0xDEADBEEF, hashS=1, offset=0x40)
        rb.line("4 :HASHSLEN(0x40)", CONSTL=4, hashSLen=1, offset=0x40)
        rb.line("$ => A :HASHSDIGEST(0x40)", inFREE=1, hashSDigest=1,
                offset=0x40, setA=1)
        rb.clear_registers()
        rb.finalize()
        _cache["srom"] = rb.build()
    return _cache["srom"]


def _sha_air():
    if "sair" not in _cache:
        _cache["sair"] = combined.build_batch_air(
            _sha_rom(), SHA_NB, include=("sha256",), sha256_cfg=_sha_cfg())
    return _cache["sair"]


def _sha_prover():
    if "sp" not in _cache:
        _cache["sp"] = StarkProver(StarkSetup(
            _sha_air(), n_queries=8, fri_fold_bits=2))
    return _cache["sp"]


def test_sha256_md_digest_helper_matches_real_sha():
    from zkevm_prover_tpu.ops import sha256 as sha_mod

    lay = hash_bit.sha256_layout()
    for msg in (b"", b"abc", bytes(range(100))):
        assert combined._md_digest(msg, lay, combined._host_sha_perm) \
            == int.from_bytes(sha_mod.sha256(msg), "big")


def test_sha256_pipeline_satisfied_and_rejects_forgery():
    res, traces = combined.execute_batch(
        _sha_rom(), SHA_NB, include=("sha256",), sha256_cfg=_sha_cfg())
    assert len(res.actions.sha256) == 1
    air = _sha_air()
    stacked = air.stack_traces(traces)
    bad = _sha_prover().check_constraints(stacked, quick=True)
    assert bad == [], f"violated constraints: {bad}"

    from zkevm_prover_tpu.executor.sm import padding_sha256

    forged = traces["padding_sha256"].copy()
    ci = {nm: i for i, nm in enumerate(padding_sha256.COLS)}
    rows = forged[:, ci["ADDR"]] == 0x40
    forged[rows, ci["DG5"]] ^= 1
    stacked = air.stack_traces({**traces, "padding_sha256": forged})
    assert _sha_prover().check_constraints(stacked, quick=True) != [], \
        "combined AIR must reject a forged sha digest"


PG_NB = 11


def _pg_rom():
    if "prom" not in _cache:
        rb = RomBuilder()
        rb.line(CONST=3, setD=1)
        rb.line("0xAABBCC :HASHP(0x30)", CONSTL=0xAABBCC, hashP=1,
                offset=0x30)
        rb.line("3 :HASHPLEN(0x30)", CONSTL=3, hashPLen=1, offset=0x30)
        rb.line("$ => A :HASHPDIGEST(0x30)", inFREE=1, hashPDigest=1,
                offset=0x30, setA=1)
        rb.clear_registers()
        rb.finalize()
        _cache["prom"] = rb.build()
    return _cache["prom"]


def _pg_air():
    if "pair" not in _cache:
        _cache["pair"] = combined.build_batch_air(
            _pg_rom(), PG_NB, include=("padding_pg",))
    return _cache["pair"]


def _pg_prover():
    if "pp" not in _cache:
        _cache["pp"] = StarkProver(StarkSetup(
            _pg_air(), n_queries=8, fri_fold_bits=2))
    return _cache["pp"]


def test_padding_pg_byte_digest_matches_reference():
    from zkevm_prover_tpu.executor.sm import padding_pg_byte
    from zkevm_prover_tpu.ops import poseidon_constants as pc
    from zkevm_prover_tpu.ops import refmodel as rm

    pos = rm.Poseidon(pc.round_constants(), pc.mds_matrix())
    for data in (b"", b"abc", bytes(range(150))):
        msgs = padding_pg_byte.layout(
            [{"data": data, "addr": 5}], PG_NB)
        assert msgs[0]["digest4"] == pos.linear_hash_bytes(data)


def test_hashp_pipeline_satisfied_and_rejects_forgery():
    res, traces = combined.execute_batch(
        _pg_rom(), PG_NB, include=("padding_pg",))
    assert len(res.actions.hashp) == 1
    air = _pg_air()
    stacked = air.stack_traces(traces)
    bad = _pg_prover().check_constraints(stacked, quick=True)
    assert bad == [], f"violated constraints: {bad}"

    from zkevm_prover_tpu.executor.sm import padding_pg_byte

    forged = traces["padding_pg_byte"].copy()
    ci = {nm: i for i, nm in enumerate(padding_pg_byte.COLS)}
    rows = forged[:, ci["ADDR"]] == 0x30
    forged[rows, ci["DG0"]] ^= 1
    stacked = air.stack_traces({**traces, "padding_pg_byte": forged})
    assert _pg_prover().check_constraints(stacked, quick=True) != [], \
        "combined AIR must reject a forged hashP digest"


def test_keccak_pipeline_rejects_forged_output_bit():
    """Flip one SOUT bit in HashBit (and its byte/digest accumulators
    consistently) — the per-bit permutation with Bits2Field must object
    because the packed output no longer matches KeccakF's wires."""
    res, traces = _run()
    lay = hash_bit.keccak_layout()
    forged = traces["keccak_bit"].copy()
    ci = {nm: i for i, nm in enumerate(hash_bit.COLS)}
    # block 1 (the empty filler chain's second block is junk-free), flip
    # output bit 300 — outside the digest region is position >= 256
    row = 1 * lay.n_pos + 300
    forged[row, ci["SOUT"]] ^= 1
    stacked = _air().stack_traces({**traces, "keccak_bit": forged})
    assert _prover().check_constraints(stacked, quick=True) != [], \
        "combined AIR must reject a forged permutation output bit"
