"""Prove ONE PRODUCTION keccak-f slot: 24 rounds, pack 44, 155,286 gate
rows — with the full Main -> PaddingKK -> HashBit -> Bits2Field -> KeccakF
bindings, at a 2^18 domain on the real chip.

Reference shape: tools/sm/keccak_f/keccak.cpp:6-8 (slotSize 155,286),
src/sm/keccak_f/keccak_f_executor.hpp:47-48 (44 bit-sliced instances per
slot, numberOfSlots=(N-1)/slotSize). The reference proves ~54 slots at
N=2^23 inside the zkevm AIR; here ONE full slot is proven stand-alone at
N=2^18 (the smallest domain that fits the slot), packed with 44 real
single-block keccak-f instances whose data comes from the fork_9 e2e
vector's batchL2Data — a real batch's hash workload.

The committed limb width is 4 bits (11 limbs for the 44-bit pack) instead
of the reference's 11 (4 limbs): the gate-semantics plookup table has
2*2^(2*limb_bits) rows, so 11-bit limbs need the reference's 2^23 domain
while 4-bit limbs (the next divisor of 44 whose table fits) suit 2^18.
Same circuit, same pack, same bindings — limb_bits only sizes the
lookup table and the committed limb count.

Usage: python tools/run_keccak_slot.py [--n-bits 18] [--out KECCAK_SLOT.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

E2E_INPUT = "/root/reference/testvectors/e2e/fork_9/input_executor_0.json"

ROUNDS = 24
PACK = 44
LIMB_BITS = 4
MSG_LEN = 135   # <= rate-1 bytes -> exactly ONE keccak-f per message


def build_rom(messages):
    """A ROM that hashes each message through HASHK/HASHKLEN/HASHKDIGEST —
    the Main-side surface of the keccak pipeline (main.pil hashK ops)."""
    from zkevm_prover_tpu.executor.rom import RomBuilder

    rb = RomBuilder()
    for mi, msg in enumerate(messages):
        addr = 0x100 + mi
        rb.line(CONST=0, setHASHPOS=1)  # fresh stream position per message
        pos = 0
        while pos < len(msg):
            chunk = msg[pos:pos + 32]
            rb.line(CONST=len(chunk), setD=1)
            rb.line(f":HASHK({hex(addr)})",
                    CONSTL=int.from_bytes(chunk, "big"), hashK=1,
                    offset=addr)
            pos += len(chunk)
        rb.line(f"{len(msg)} :HASHKLEN({hex(addr)})", CONSTL=len(msg),
                hashKLen=1, offset=addr)
        rb.line(f"$ => A :HASHKDIGEST({hex(addr)})", inFREE=1,
                hashKDigest=1, offset=addr, setA=1)
    rb.clear_registers()
    rb.finalize()
    return rb.build()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-bits", type=int, default=18)
    ap.add_argument("--n-messages", type=int, default=PACK)
    ap.add_argument("--out", default="KECCAK_SLOT.json")
    ap.add_argument("--check-only", action="store_true",
                    help="constraint-check the trace, skip the full prove")
    ap.add_argument("--cpu", action="store_true",
                    help="force the host-CPU jax backend (the axon "
                         "sitecustomize pins the TPU otherwise)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/zkevm_prover_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from zkevm_prover_tpu.executor import combined
    from zkevm_prover_tpu.executor.sm import keccak_circuit as kc
    from zkevm_prover_tpu.ops import keccak as keccak_mod
    from zkevm_prover_tpu.stark.prover import StarkProver
    from zkevm_prover_tpu.stark.setup import StarkSetup
    from zkevm_prover_tpu.stark.verifier import verify

    # real batch data: fork_9 e2e vector batchL2Data, chunked into
    # single-block messages that fill the 44 pack lanes of one slot
    with open(E2E_INPUT) as f:
        batch_hex = json.load(f)["batchL2Data"]
    data = bytes.fromhex(batch_hex[2:])
    while len(data) < args.n_messages * MSG_LEN:
        data = data + data
    messages = [data[i * MSG_LEN:(i + 1) * MSG_LEN]
                for i in range(args.n_messages)]

    t0 = time.time()
    circ = kc.build(ROUNDS)
    cfg = combined.keccak_pipeline_cfg(circ, PACK, LIMB_BITS)
    slot_rows = circ.n_rows
    rom = build_rom(messages)
    res, traces = combined.execute_batch(
        rom, args.n_bits, include=("keccak",), keccak_cfg=cfg)
    exec_s = time.time() - t0
    assert len(res.actions.keccak) == args.n_messages
    # digests must be the REAL keccak-256 (24 rounds — no reduced oracle)
    for msg, act in zip(messages, res.actions.keccak):
        want = int.from_bytes(keccak_mod.keccak256(msg), "big")
        assert int(act["digest"]) == want, "digest mismatch vs XKCP keccak"

    t0 = time.time()
    air = combined.build_batch_air(rom, args.n_bits, include=("keccak",),
                                   keccak_cfg=cfg)
    setup = StarkSetup(air, n_queries=8, fri_fold_bits=2)
    prover = StarkProver(setup)
    setup_s = time.time() - t0
    stacked = air.stack_traces(traces)

    out = {
        "metric": "keccak_slot_proof",
        "rounds": ROUNDS, "pack": PACK, "limb_bits": LIMB_BITS,
        "slot_rows": int(slot_rows), "n_bits": args.n_bits,
        "n_cols": int(stacked.shape[1]),
        "n_messages": args.n_messages,
        "hashed_bytes": args.n_messages * MSG_LEN,
        "executor_s": round(exec_s, 1), "setup_s": round(setup_s, 1),
    }
    if args.check_only:
        t0 = time.time()
        bad = prover.check_constraints(stacked, quick=True)
        out["check_s"] = round(time.time() - t0, 1)
        out["violated"] = bad
        assert bad == [], f"violated: {bad}"
    else:
        t0 = time.time()
        proof = prover.prove(stacked)
        out["first_prove_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        proof = prover.prove(stacked)
        out["steady_prove_s"] = round(time.time() - t0, 1)
        out["verified"] = bool(verify(setup, prover.verkey, proof))
        assert out["verified"]
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
