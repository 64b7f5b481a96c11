"""The 5-phase eSTARK prover on device.

TPU-native re-design of the reference's `Starks::genProof`
(src/starkpil/starks.cpp:9-395):

  phase 1  commit the stage-1 trace        (LDE + Merkle, starks.cpp:53-60)
  phase 2  plookup h1/h2                   (starks.cpp:92-141)
  phase 3  grand products z                (starks.cpp:174-222)
  phase 4  quotient on the extended coset  (starks.cpp:241-293)
  phase 5  openings at xi / w·xi + FRI pol (starks.cpp:302-386)
  FRI      fold/commit/query               (fri/friProve.cpp)

Differences from the reference's architecture (deliberate, TPU-first):
  * no shared byte arena with mapOffsets — sections are plain device arrays
    in a dict; XLA owns placement
  * H1H2 is a device sort/segment pipeline instead of std::multimap
    (Polinomial::calculateH1H2, polinomial.hpp:249)
  * Z is a log-depth associative scan instead of a sequential loop
    (Polinomial::calculateZ, polinomial.hpp:586)
  * constraint evaluation is the traced expression DAG (expr.py), not
    generated AVX chelpers
  * the Fiat-Shamir transcript stays on host (it is a handful of Poseidon
    calls); every bulk phase is a separate jit program

The transcript absorb/squeeze schedule matches the reference exactly
(SURVEY.md App. B) so the proof shape is drop-in compatible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gl3
from ..ops import goldilocks as gl
from ..ops import merkle
from ..ops import ntt as nttmod
from ..ops import refmodel as rm
from ..ops import transcript as tr
from . import expr as ex
from . import fri as frimod
from . import scheme as schememod
from .proof import LayerQueries, MerkleQuery, StarkProof
from .setup import StarkSetup

HASH_SIZE = 4


# ---------------------------------------------------------------------------
# device building blocks
# ---------------------------------------------------------------------------


def calculate_h1h2(f, t):
    """Plookup h1/h2: (N, d) f/t -> ((N, d), (N, d), ok_flag).

    Semantics of Polinomial::calculateH1H2_ (polinomial.hpp:304-347): the
    multiset t ∪ f ordered by the t-index of each value, split alternately.
    Device formulation: lexsort the combined array, propagate the canonical
    (last) t-occurrence through equal-value runs with segment maxima, count
    f-hits per t-row, then rebuild the interleaved sequence with a
    searchsorted over the cumulative counts.
    """
    n, d = t.shape
    if isinstance(t, np.ndarray) and isinstance(f, np.ndarray):
        return _calculate_h1h2_np(f, t)
    comb = jnp.concatenate([t, f], axis=0)
    is_f = jnp.concatenate(
        [jnp.zeros(n, jnp.int32), jnp.ones(n, jnp.int32)]
    )
    tidx = jnp.concatenate(
        [jnp.arange(n, dtype=jnp.int32), jnp.zeros(n, jnp.int32)]
    )
    order = jnp.lexsort(tuple(comb[:, i] for i in range(d)))
    sc = comb[order]
    sf = is_f[order]
    sti = tidx[order]
    boundary = jnp.concatenate(
        [jnp.ones(1, jnp.int32), jnp.any(sc[1:] != sc[:-1], axis=1).astype(jnp.int32)]
    )
    seg = jnp.cumsum(boundary) - 1
    t_or_neg = jnp.where(sf == 1, jnp.int32(-1), sti)
    seg_max = jax.ops.segment_max(t_or_neg, seg, num_segments=2 * n)
    canon = seg_max[seg]
    ok = jnp.all((sf == 0) | (canon >= 0))  # every f value appears in t
    f_cnt = jax.ops.segment_sum(sf, jnp.clip(canon, 0), num_segments=n)
    cnt = 1 + f_cnt
    cum = jnp.cumsum(cnt)
    j = jnp.arange(2 * n, dtype=cum.dtype)
    src = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    seq = t[src]
    return seq[0::2], seq[1::2], ok


def _calculate_h1h2_np(f, t):
    """Numpy twin of calculate_h1h2 (identical semantics; used by the quick
    satisfiability checker, where eager jnp dispatch dominates wall-clock)."""
    n, d = t.shape
    comb = np.concatenate([t, f], axis=0)
    is_f = np.concatenate([np.zeros(n, np.int64), np.ones(n, np.int64)])
    tidx = np.concatenate([np.arange(n, dtype=np.int64),
                           np.zeros(n, np.int64)])
    order = np.lexsort(tuple(comb[:, i] for i in range(d)))
    sc, sf, sti = comb[order], is_f[order], tidx[order]
    boundary = np.concatenate(
        [np.ones(1, np.int64),
         np.any(sc[1:] != sc[:-1], axis=1).astype(np.int64)])
    seg = np.cumsum(boundary) - 1
    t_or_neg = np.where(sf == 1, np.int64(-1), sti)
    starts = np.nonzero(boundary)[0]
    seg_max = np.maximum.reduceat(t_or_neg, starts)
    canon = seg_max[seg]
    ok = bool(np.all((sf == 0) | (canon >= 0)))
    f_cnt = np.bincount(np.clip(canon, 0, None), weights=sf,
                        minlength=n)[:n].astype(np.int64)
    cum = np.cumsum(1 + f_cnt)
    src = np.searchsorted(cum, np.arange(2 * n), side="right")
    seq = t[src]
    return seq[0::2], seq[1::2], ok


def calculate_z(num, den):
    """Grand product z[0]=1, z[i]=prod_{j<i} num_j/den_j as (N, 3).

    Reference: Polinomial::calculateZ (polinomial.hpp:586) — sequential there,
    a batch inversion + log-depth inclusive scan + shift here.
    """
    num3 = num if num.ndim == 2 else gl3.from_base(num)
    den3 = den if den.ndim == 2 else gl3.from_base(den)
    ratio = gl3.mul(num3, gl3.batch_inverse(den3, axis=0))
    incl = gl.scan_mul(ratio, axis=0, op=gl3.mul)
    if isinstance(incl, np.ndarray):
        return np.concatenate([gl3.one((1,), np_backend=True), incl[:-1]],
                              axis=0)
    return jnp.concatenate([gl3.one((1,)), incl[:-1]], axis=0)


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------


class StarkProver:
    """Holds the setup + preprocessed constants; `prove` runs the pipeline.

    Reference analogue: the Starks object, which preloads const pols and their
    Merkle tree at startup (src/starkpil/starks.hpp:75-140).

    With `mesh` (a 1-axis jax.sharding.Mesh), every (N, cols) section is
    row-sharded over `mesh_axis` and the LDEs run the distributed four-step
    NTT (parallel/ntt_sharded.py: shard_map + all_to_all over ICI). All
    other phases are row-local or XLA-partitionable (sorts, scans, hashes),
    so GSPMD needs no data resharding — the fix for the involuntary full
    rematerialization the round-1 col->row constraint pair caused. Proof
    bytes are bit-identical to the single-chip path (exact integer math).
    """

    def __init__(self, setup: StarkSetup, mesh=None, mesh_axis: str = "row"):
        self.setup = setup
        self.scheme = schememod.get(getattr(setup, "hash_type", "GL"))
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        s = setup
        self.blowup = 1 << (s.n_bits_ext - s.n_bits)

        consts = (
            np.stack(s.air.const_values, axis=1)
            if s.air.const_values
            else np.zeros((s.n, 0), dtype=np.uint64)
        )
        self._const_np = consts   # host copy (TPU trace-domain spilling)
        self._n_consts = consts.shape[1]

        # x and 1/Z_H on the extended coset (reference: x_2ns, ZhInv).
        # Built EAGERLY so the values are concrete before any phase traces
        # capture them (never cache tracers).
        self._x_2ns = jax.jit(
            lambda: gl.mul(
                nttmod.geometric_powers(gl.w(s.n_bits_ext), s.n_ext),
                jnp.uint64(gl.shift()),
            )
        )()
        zi_vals = []
        sn = pow(gl.shift(), s.n, gl.P)
        wn = pow(gl.w(s.n_bits_ext), s.n, gl.P)
        for m in range(self.blowup):
            zh = (sn * pow(wn, m, gl.P) - 1) % gl.P
            zi_vals.append(pow(zh, gl.P - 2, gl.P))
        self._zi_2ns = jnp.asarray(np.tile(np.array(zi_vals, np.uint64), s.n))

    # -- preprocessed commitment (lazy: quick constraint checks and pure
    # verification paths never need the const LDE + Merkle) ------------------

    @functools.cached_property
    def const_n(self):
        """Trace-domain constants on device — materialized on demand (the
        TPU prove path feeds phases from the host copy instead)."""
        return self._shard(jnp.asarray(self._const_np))

    @functools.cached_property
    def const_2ns(self):
        if not self._n_consts:
            return jnp.zeros((self.setup.n_ext, 0), dtype=jnp.uint64)
        if self.mesh is None and jax.default_backend() != "cpu":
            return self._extend(self._const_np)   # block-transfers from host
        return self._extend(self.const_n)

    @functools.cached_property
    def const_tree(self):
        return self.scheme.commit(self.const_2ns)

    @property
    def verkey(self):
        return self.const_tree.root()

    # -- sharding ------------------------------------------------------------

    def _shard(self, arr):
        """Row-shard an (N, ...) section over the mesh (no-op single-chip)."""
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec

        spec = PartitionSpec(self.mesh_axis, *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    # -- bindings ------------------------------------------------------------

    def _col(self, sections, cid):
        info = self.setup.cols[cid]
        arr = sections[info.stage]
        if info.dim == 1:
            return arr[:, info.pos]
        return arr[:, info.pos : info.pos + 3]

    def _bindings(self, sections, consts, challenges, publics, *, ext: bool,
                  x=None, zi=None, xdxx=None, xdwx=None, evals=None):
        return ex.ArrayBindings(
            cm=lambda cid: self._col(sections, cid),
            const=lambda cid: consts[:, cid],
            challenges=challenges,
            publics=publics,
            x=x,
            zi=zi,
            xdivxsubxi=xdxx,
            xdivxsubwxi=xdwx,
            evals=evals,
            prime_stride=self.blowup if ext else 1,
        )

    def x_2ns(self):
        return self._x_2ns

    def zi_2ns(self):
        """1/Z_H on the coset — periodic with period blowup (zhInv.cpp:7-31)."""
        return self._zi_2ns

    # -- phases (each jitted once per setup) ----------------------------------

    # LDE column chunk: the four-step NTT's transposes materialize ~4
    # copies of its operand; extending a wide section (a combined batch
    # AIR has 300-700 columns) in one call peaks at copies x full width
    # and exhausts HBM alongside the resident sections. Chunking bounds
    # the transient to copies x _EXT_COLS columns (reference analogue:
    # extendPol's column-blocked aux buffer, starks.cpp:53). 128 = one
    # full TPU lane tile: narrower blocks pad to 128 lanes anyway (a
    # 64-col u64 block costs the HBM of 128), doubling the footprint.
    _EXT_COLS = 128

    @functools.cached_property
    def _extend_one(self):
        s = self.setup
        if self.mesh is not None:
            from ..parallel import ntt_sharded as nsh

            mesh, ax = self.mesh, self.mesh_axis
            return jax.jit(lambda v: nsh.extend_pol_sharded(
                v, s.n_bits, s.n_bits_ext, mesh, axis=ax, col_axis=None))
        return jax.jit(lambda v: nttmod.extend_pol(v, s.n_bits, s.n_bits_ext))

    def _extend(self, v):
        # chunked on EVERY backend: XLA:CPU for local compile RSS, TPU
        # because the fused 300-700-col four-step's ~4 transient copies
        # exceed the tunnel session's ~7 GB HBM budget once the AIR
        # constants are resident (measured: unchunked 291 cols dies,
        # 64-col blocks fit)
        import os

        dbg = os.environ.get("ZK_MEMDEBUG")
        c = v.shape[1] if v.ndim == 2 else None
        if c is None or c <= self._EXT_COLS:
            return self._extend_one(v)
        blocks = []
        for i in range(0, c, self._EXT_COLS):
            if dbg:
                live = sum(a.nbytes for a in jax.live_arrays())
                print(f"[mem] extend col={i}/{c} live={live/1e9:.2f} GB "
                      f"({len(jax.live_arrays())} arrays)", flush=True)
            blocks.append(self._extend_one(v[:, i:i + self._EXT_COLS]))
            jax.block_until_ready(blocks[-1])
        return jnp.concatenate(blocks, axis=1)

    @functools.cached_property
    def _phase2_run(self):
        s = self.setup

        def run(cm1_n, const_n, challenges, publics):
            xp = np if isinstance(cm1_n, np.ndarray) else jnp
            sections = {1: cm1_n}
            b = self._bindings(sections, const_n, challenges, publics, ext=False)
            cols, oks = [], []
            for plan in s.lookups:
                fv = ex.eval_array(plan.f_exp, b)
                tv = ex.eval_array(plan.t_exp, b)
                fv = fv[:, None] if fv.ndim == 1 else fv
                tv = tv[:, None] if tv.ndim == 1 else tv
                h1, h2, ok = calculate_h1h2(fv, tv)
                cols += [h1, h2]
                oks.append(ok)
            w2 = s.section_width[2]
            cm2 = (
                xp.concatenate(cols, axis=1)
                if cols
                else xp.zeros((s.n, w2), np.uint64)
            )
            return cm2, (xp.array(oks) if oks
                         else xp.ones((0,), np.bool_))

        return run

    @functools.cached_property
    def _phase2_fn(self):
        return jax.jit(self._phase2_run)

    def _phase3_group_run(self, plans):
        s = self.setup

        def run(cm1_n, cm2_n, const_n, challenges, publics):
            xp = np if isinstance(cm1_n, np.ndarray) else jnp
            sections = {1: cm1_n, 2: cm2_n}
            x_n = nttmod.geometric_powers(gl.w(s.n_bits), s.n,
                                          np_backend=xp is np)
            aux_vals: dict = {}

            def cm_bind(cid):
                if cid in aux_vals:
                    return aux_vals[cid]
                return self._col(sections, cid)

            b = ex.ArrayBindings(
                cm=cm_bind, const=lambda cid: const_n[:, cid],
                challenges=challenges, publics=publics, x=x_n,
                prime_stride=1)
            cols = []
            for plan in plans:
                # wide-connection partial products precede their z
                for cid, e in getattr(plan, "aux", []):
                    v = ex.eval_array(e, b)
                    v = v if v.ndim == 2 else gl3.from_base(v)
                    aux_vals[cid] = v
                    cols.append(v)
                num = ex.eval_array(plan.num, b)
                den = ex.eval_array(plan.den, b)
                cols.append(calculate_z(num, den))
            return xp.concatenate(cols, axis=1)

        return run

    # plans per phase-3 program ON CPU: a combined batch AIR carries
    # ~100 z columns whose single fused graph (eval DAGs + batch
    # inversions + log-depth scans) blows the XLA:CPU compiler past
    # 100 GB RSS — grouped programs compile in bounded memory (same
    # reasoning as _C_CHUNK for phase 4). On TPU the compile is remote
    # and one program avoids per-chunk allocation churn.
    _Z_CHUNK = 12

    @property
    def _z_chunk(self) -> int:
        return self._Z_CHUNK if jax.default_backend() == "cpu" else 10 ** 6

    def _phase3_run(self, cm1_n, cm2_n, const_n, challenges, publics):
        """Numpy twin used by the quick checker (ungrouped is fine there)."""
        s = self.setup
        plans = s.lookups + s.permutations + s.connections
        if not plans:
            return np.zeros((s.n, s.section_width[3]), np.uint64)
        return self._phase3_group_run(plans)(
            cm1_n, cm2_n, const_n, challenges, publics)

    @functools.cached_property
    def _phase3_chunk_fns(self):
        s = self.setup
        plans = s.lookups + s.permutations + s.connections
        groups = [plans[i:i + self._z_chunk]
                  for i in range(0, len(plans), self._z_chunk)]
        return [jax.jit(self._phase3_group_run(g)) for g in groups]

    def _phase3_fn(self, cm1_n, cm2_n, const_n, challenges, publics):
        s = self.setup
        outs = [fn(cm1_n, cm2_n, const_n, challenges, publics)
                for fn in self._phase3_chunk_fns]
        if not outs:
            return jnp.zeros((s.n, s.section_width[3]), jnp.uint64)
        return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]

    # combined-constraint evaluation is CHUNKED: a production batch AIR has
    # ~1000 constraints whose single fused XLA graph materializes tens of
    # thousands of (NExt, 3) intermediates — the chunks bound live memory
    # (one compiled program per chunk, accumulated with host QC powers)
    _C_CHUNK = 48

    @functools.cached_property
    def _phase4_chunk_fns(self):
        s = self.setup
        groups = [s.constraints[i:i + self._C_CHUNK]
                  for i in range(0, len(s.constraints), self._C_CHUNK)]
        fns = []
        for g in groups:
            comb = None
            for c in g:
                comb = c if comb is None else comb * ex.Challenge(4) + c

            def run(cm1, cm2, cm3, const_2ns, challenges, publics, acc,
                    qc_pow, x2, zi2, _comb=comb):
                # x2/zi2 ride as ARGUMENTS: a closed-over concrete device
                # array is embedded as an HLO constant (33.5 MB each at
                # 2^22), which OOM-kills the remote AOT compile helper
                sections = {1: cm1, 2: cm2, 3: cm3}
                b = self._bindings(sections, const_2ns, challenges, publics,
                                   ext=True, x=x2, zi=zi2)
                v = ex.eval_array(_comb, b)
                if v.ndim == 1:
                    v = gl3.from_base(v)
                return gl3.add(
                    gl3.mul(acc, jnp.broadcast_to(qc_pow, acc.shape)), v)

            fns.append((jax.jit(run), len(g)))
        return fns

    @functools.cached_property
    def _phase4_finish_fn(self):
        s = self.setup

        def run(c_val, zi2):
            q = gl3.mul(c_val, gl3.from_base(zi2))
            # split q into qDeg degree-<N polys, each evaluated on the coset
            # (reference: INTT -> per-chunk shift^{-pN} scale -> NTT,
            #  starks.cpp:262-287)
            coefs = self._ntt_ext(q, inverse=True)  # \hat c_j = c_j shift^j
            shift_in = pow(gl.shift_inv(), s.n, gl.P)
            chunks = []
            for p in range(s.q_deg):
                c = coefs[p * s.n : (p + 1) * s.n]
                c = gl.mul(c, jnp.uint64(pow(shift_in, p, gl.P)))
                pad = jnp.zeros((s.n_ext - s.n, 3), jnp.uint64)
                chunks.append(self._ntt_ext(jnp.concatenate([c, pad]),
                                            inverse=False))
            return jnp.concatenate(chunks, axis=1)  # (NExt, 3*qDeg)

        return jax.jit(run)

    def _phase4_fn(self, cm1_2ns, cm2_2ns, cm3_2ns, const_2ns, challenges,
                   publics):
        s = self.setup
        qc = tuple(int(v) for v in np.asarray(challenges)[4])
        acc = jnp.zeros((s.n_ext, 3), jnp.uint64)
        for fn, glen in self._phase4_chunk_fns:
            qc_pow = jnp.asarray(
                np.array(rm.pow3(qc, glen), dtype=np.uint64))
            acc = fn(cm1_2ns, cm2_2ns, cm3_2ns, const_2ns, challenges,
                     publics, acc, qc_pow, self.x_2ns(), self.zi_2ns())
        return self._phase4_finish_fn(acc, self.zi_2ns())

    def _ntt_ext(self, v, *, inverse: bool):
        """NTT/INTT on the extended domain — distributed under a mesh."""
        s = self.setup
        if self.mesh is not None:
            from ..parallel import ntt_sharded as nsh

            return nsh.ntt_sharded(v, self.mesh, axis=self.mesh_axis,
                                   n_bits=s.n_bits_ext, inverse=inverse,
                                   col_axis=None)
        return (nttmod.intt if inverse else nttmod.ntt)(v, s.n_bits_ext)

    @functools.cached_property
    def _phase5_evals_fn(self):
        s = self.setup

        def run(sections_2ns, const_2ns, xi):
            # Lagrange-at-xi weights over the strided coset rows
            # (starks.cpp:302-330): LEv = INTT(geom(xi/shift)).
            shift_i = jnp.uint64(gl.shift_inv())
            xi_s = gl3.mul_base(xi, shift_i)
            w_xi_s = gl3.mul_base(gl3.mul_base(xi, jnp.uint64(gl.w(s.n_bits))), shift_i)
            lev = nttmod.intt(_geom3(xi_s, s.n), s.n_bits)
            lpev = nttmod.intt(_geom3(w_xi_s, s.n), s.n_bits)
            out = []
            for e in s.ev_map:
                if e.type == "cm":
                    vals = self._col(sections_2ns, e.id)
                else:
                    info_dim = 1
                    vals = const_2ns[:, e.id]
                vals = vals[:: self.blowup]
                weights = lpev if e.prime else lev
                if vals.ndim == 1:
                    prod = gl.mul(weights, vals[:, None])  # (N, 3)
                else:
                    prod = gl3.mul(weights, vals)
                out.append(gl.modsum(prod, 0))
            return jnp.stack(out)  # (nEv, 3)

        return jax.jit(run)

    # FRI-polynomial evaluation is chunked like phase 4: a big AIR's evMap
    # (1000s of entries) fused into one graph materializes too many
    # (NExt, 3) intermediates on a CPU host
    _EV_CHUNK = 192

    @functools.cached_property
    def _phase5_fri_chunk_fns(self):
        s = self.setup
        V1, V2 = ex.Challenge(5), ex.Challenge(6)
        entries = list(enumerate(s.ev_map))
        groups = [entries[i:i + self._EV_CHUNK]
                  for i in range(0, len(entries), self._EV_CHUNK)]
        fns = []
        for g in groups:
            e1 = e2 = None
            a = b_cnt = 0
            for k, e in g:
                leaf = ex.Cm(e.id) if e.type == "cm" else ex.Const(e.id)
                term = leaf - ex.Eval(k)
                if e.prime:
                    e2 = term if e2 is None else e2 * V2 + term
                    b_cnt += 1
                else:
                    e1 = term if e1 is None else e1 * V1 + term
                    a += 1

            def run(sections_2ns, const_2ns, challenges, publics, evals,
                    acc1, acc2, v1p, v2p, x2, zi2, _e1=e1, _e2=e2):
                bnd = self._bindings(sections_2ns, const_2ns, challenges,
                                     publics, ext=True, x=x2,
                                     zi=zi2, evals=evals)
                shape = acc1.shape
                if _e1 is not None:
                    v = ex.eval_array(_e1, bnd)
                    v = v if v.ndim == 2 else gl3.from_base(v)
                    acc1 = gl3.add(
                        gl3.mul(acc1, jnp.broadcast_to(v1p, shape)), v)
                if _e2 is not None:
                    v = ex.eval_array(_e2, bnd)
                    v = v if v.ndim == 2 else gl3.from_base(v)
                    acc2 = gl3.add(
                        gl3.mul(acc2, jnp.broadcast_to(v2p, shape)), v)
                return acc1, acc2

            fns.append((jax.jit(run), a, b_cnt))
        return fns

    @functools.cached_property
    def _phase5_fri_finish_fn(self):
        s = self.setup

        def run(challenges, acc1, acc2, x):
            xi3 = challenges[7]
            wxi3 = gl3.mul_base(xi3, jnp.uint64(gl.w(s.n_bits)))
            xs = gl3.sub(gl3.from_base(x), jnp.broadcast_to(xi3, (s.n_ext, 3)))
            xws = gl3.sub(gl3.from_base(x), jnp.broadcast_to(wxi3, (s.n_ext, 3)))
            # Elementwise paired inversion (one gl3.inv for both divisors).
            # batch_inverse's associative scans at n_ext >= 2^21 blow up the
            # XLA compile (the AOT helper OOMs on the 2x log-depth scan
            # graphs); the adjugate inverse is a fixed-size elementwise graph.
            pair_inv = gl3.inv(gl3.mul(xs, xws))
            xdxx = gl3.mul_base(gl3.mul(pair_inv, xws), x)
            xdwx = gl3.mul_base(gl3.mul(pair_inv, xs), x)
            return gl3.add(gl3.mul(acc1, xdxx), gl3.mul(acc2, xdwx))

        return jax.jit(run)

    def _phase5_fri_fn(self, sections_2ns, const_2ns, challenges, publics,
                       evals):
        s = self.setup
        ch = np.asarray(challenges)
        v1 = tuple(int(v) for v in ch[5])
        v2 = tuple(int(v) for v in ch[6])
        acc1 = jnp.zeros((s.n_ext, 3), jnp.uint64)
        acc2 = jnp.zeros((s.n_ext, 3), jnp.uint64)
        for ci, (fn, a, b_cnt) in enumerate(self._phase5_fri_chunk_fns):
            v1p = jnp.asarray(np.array(rm.pow3(v1, a), dtype=np.uint64))
            v2p = jnp.asarray(np.array(rm.pow3(v2, b_cnt), dtype=np.uint64))
            acc1, acc2 = fn(sections_2ns, const_2ns, challenges, publics,
                            evals, acc1, acc2, v1p, v2p,
                            self.x_2ns(), self.zi_2ns())
            self._t(f"ph5_fri_chunk{ci}", acc1)
        out = self._phase5_fri_finish_fn(challenges, acc1, acc2,
                                         self.x_2ns())
        self._t("ph5_fri_finish", out)
        return out

    @functools.cached_property
    def _check_run(self):
        s = self.setup

        def run(cm1_n, cm2_n, cm3_n, const_n, challenges, publics):
            xp = np if isinstance(cm1_n, np.ndarray) else jnp
            sections = {1: cm1_n, 2: cm2_n, 3: cm3_n}
            x_n = nttmod.geometric_powers(gl.w(s.n_bits), s.n,
                                          np_backend=xp is np)
            b = self._bindings(sections, const_n, challenges, publics,
                               ext=False, x=x_n)
            return xp.stack(
                [xp.max(ex.eval_array(c, b)) for c in s.constraints]
            )

        return run

    @functools.cached_property
    def _check_fn(self):
        """All constraints evaluated in ONE jitted program -> (nC,) maxima.
        (One jit per constraint would dominate wall-clock at trace time.)"""
        return jax.jit(self._check_run)

    def check_constraints(self, cm1_values, publics=None,
                          quick: bool = False) -> list[int]:
        """Diagnostic: run phases 1-3 and evaluate every constraint on the
        trace domain; returns indices of violated constraints (empty = ok).
        The role of the reference's zkassert in calculateZ
        (polinomial.hpp:606) and of proverjs pol checks.

        quick=True uses fixed pseudo-random challenges instead of the real
        transcript, skipping the LDE + Merkle commits entirely — identities
        that hold for the honest transcript hold identically in the
        challenge variables, so this is a sound satisfiability check (and
        the form forgery tests want: seconds, not minutes)."""
        s = self.setup
        cm1_n = self._shard(jnp.asarray(cm1_values, dtype=jnp.uint64))
        if publics is None:
            publics = [int(cm1_values[row, cid]) for (_, cid, row) in s.air.publics]
        publics_dev = jnp.asarray(np.array(publics, dtype=np.uint64))

        if quick:
            # pure-NUMPY evaluation: the backend-polymorphic gl/gl3 ops run
            # on host arrays — no XLA compile, no per-op jnp dispatch (which
            # made a 300-column quick check take minutes)
            rng = np.random.default_rng(0xC0FFEE)
            challenges = rng.integers(
                1, (1 << 63), size=(8, 3)).astype(np.uint64)
            cm1_np = np.asarray(cm1_values, dtype=np.uint64)
            const_np = self._const_np
            publics_np = np.array(publics, dtype=np.uint64)
            with np.errstate(over="ignore"):
                cm2_n, lookups_ok = self._phase2_run(
                    cm1_np, const_np, challenges, publics_np)
                cm3_n = self._phase3_run(cm1_np, cm2_n, const_np,
                                         challenges, publics_np)
                maxima = self._check_run(cm1_np, cm2_n, cm3_n, const_np,
                                         challenges, publics_np)
            bad: list = [i for i, v in enumerate(maxima) if int(v) != 0]
            bad += [f"plookup:{i}" for i, v in
                    enumerate(np.asarray(lookups_ok)) if not bool(v)]
            return bad

        transcript = self.scheme.Transcript()
        transcript.put(self.scheme.root_ints(self.verkey))
        transcript.put(publics)
        challenges = np.zeros((8, 3), dtype=np.uint64)
        cm1_2ns = self._extend(cm1_n)
        tree1 = self.scheme.commit(cm1_2ns)
        transcript.put(self.scheme.root_ints(tree1.root()))
        challenges[0] = transcript.get_field3()
        challenges[1] = transcript.get_field3()
        cm2_n, lookups_ok = self._phase2_fn(cm1_n, self.const_n,
                                            jnp.asarray(challenges),
                                            publics_dev)
        cm2_2ns = self._extend(cm2_n) if s.section_width[2] else jnp.zeros(
            (s.n_ext, 0), jnp.uint64)
        tree2 = self.scheme.commit(cm2_2ns)
        transcript.put(self.scheme.root_ints(tree2.root()))
        challenges[2] = transcript.get_field3()
        challenges[3] = transcript.get_field3()
        cm3_n = self._phase3_fn(cm1_n, cm2_n, self.const_n,
                                jnp.asarray(challenges), publics_dev)
        maxima = np.asarray(
            self._check_fn(cm1_n, cm2_n, cm3_n, self.const_n,
                           jnp.asarray(challenges), publics_dev)
        )
        bad: list = [i for i, v in enumerate(maxima) if int(v) != 0]
        bad += [f"plookup:{i}" for i, v in
                enumerate(np.asarray(lookups_ok)) if not bool(v)]
        return bad

    # -- main entry ------------------------------------------------------------

    @staticmethod
    def _t(label: str, value=None):
        """ZK_PHASE_TIMERS=1: block on `value` and log the phase wall-clock —
        the reference's TimerStopAndLog(STARK_STEP_*) (utils/timer.hpp:17-27).
        Off by default so phases stay async-pipelined."""
        import os

        if not os.environ.get("ZK_PHASE_TIMERS"):
            return
        import time as _time

        if value is not None:
            jax.block_until_ready(value)
        now = _time.perf_counter()
        prev = getattr(StarkProver._t, "_last", None)
        StarkProver._t._last = now
        if prev is not None:
            print(f"[stark] {label}: {now - prev:.2f}s", flush=True)

    def prove(self, cm1_values, publics=None) -> StarkProof:
        """Generate a proof for stage-1 trace `cm1_values` ((N, nCm1) uint64)."""
        s = self.setup
        # On the TPU, trace-domain sections stay on HOST: the tunnel chip's
        # usable HBM (~8 GB) must hold the EXTENDED sections (lane padding
        # inflates (N, C) u64 arrays up to 2x) for phases 4/5 + queries;
        # the trace-domain copies are consumed whole by the phase-2/3
        # programs, which auto-transfer their (host) arguments per call.
        spill = self.mesh is None and jax.default_backend() != "cpu"
        if spill:
            cm1_n = np.ascontiguousarray(
                np.asarray(cm1_values, dtype=np.uint64))
        else:
            cm1_n = self._shard(jnp.asarray(cm1_values, dtype=jnp.uint64))
        assert cm1_n.shape == (s.n, s.air.n_cm1)

        if publics is None:
            publics = [
                int(cm1_values[row, cid]) for (_, cid, row) in s.air.publics
            ]
        publics_dev = jnp.asarray(np.array(publics, dtype=np.uint64))

        transcript = self.scheme.Transcript()
        transcript.put(self.scheme.root_ints(self.verkey))
        transcript.put(publics)

        challenges = np.zeros((8, 3), dtype=np.uint64)

        # ---- phase 1
        self._t("start")
        cm1_2ns = self._extend(cm1_n)
        self._t("ph1_extend", cm1_2ns)
        tree1 = self.scheme.commit(cm1_2ns)
        self._t("ph1_commit", tree1.root())
        transcript.put(self.scheme.root_ints(tree1.root()))

        # ---- phase 2
        const_arg = self._const_np if spill else self.const_n
        challenges[0] = transcript.get_field3()
        challenges[1] = transcript.get_field3()
        ch = jnp.asarray(challenges)
        cm2_n, ok = self._phase2_fn(cm1_n, const_arg, ch, publics_dev)
        self._t("ph2_h1h2", cm2_n)
        ok = jnp.all(ok)
        if not bool(ok):
            raise ValueError("plookup violation: f value not present in t")
        cm2_2ns = self._extend(cm2_n) if s.section_width[2] else jnp.zeros(
            (s.n_ext, 0), jnp.uint64
        )
        tree2 = self.scheme.commit(cm2_2ns)
        self._t("ph2_commit", tree2.root())
        transcript.put(self.scheme.root_ints(tree2.root()))

        # ---- phase 3
        challenges[2] = transcript.get_field3()
        challenges[3] = transcript.get_field3()
        ch = jnp.asarray(challenges)
        cm3_n = self._phase3_fn(cm1_n, cm2_n, const_arg, ch, publics_dev)
        self._t("ph3_z", cm3_n)
        del cm2_n   # trace-domain copies are dead once cm3 exists
        cm3_2ns = self._extend(cm3_n) if s.section_width[3] else jnp.zeros(
            (s.n_ext, 0), jnp.uint64
        )
        del cm3_n
        tree3 = self.scheme.commit(cm3_2ns)
        self._t("ph3_commit", tree3.root())
        transcript.put(self.scheme.root_ints(tree3.root()))

        # ---- phase 4
        challenges[4] = transcript.get_field3()
        ch = jnp.asarray(challenges)
        cm4_2ns = self._phase4_fn(cm1_2ns, cm2_2ns, cm3_2ns, self.const_2ns,
                                  ch, publics_dev)
        self._t("ph4_quotient", cm4_2ns)
        tree4 = self.scheme.commit(cm4_2ns)
        self._t("ph4_commit", tree4.root())
        transcript.put(self.scheme.root_ints(tree4.root()))

        # ---- phase 5
        challenges[7] = transcript.get_field3()
        ch = jnp.asarray(challenges)
        sections_2ns = {1: cm1_2ns, 2: cm2_2ns, 3: cm3_2ns, 4: cm4_2ns}
        evals_dev = self._phase5_evals_fn(sections_2ns, self.const_2ns,
                                          jnp.asarray(challenges[7]))
        self._t("ph5_evals", evals_dev)
        evals_np = np.asarray(evals_dev)
        for e in evals_np:
            transcript.put([int(v) for v in e])
        challenges[5] = transcript.get_field3()
        challenges[6] = transcript.get_field3()
        ch = jnp.asarray(challenges)
        fri_pol = self._phase5_fri_fn(sections_2ns, self.const_2ns, ch,
                                      publics_dev, evals_dev)
        self._t("ph5_fri_pol", fri_pol)

        # ---- FRI fold/commit
        # The reference squeezes special_x at the top of EVERY step iteration
        # (including the si=0 copy, friProve.cpp:29-30); special_xs[si] folds
        # layer si-1 -> si for si >= 1.
        steps = s.fri_steps
        layers = [fri_pol]
        layer_trees = [None]
        layer_roots = [None]
        special_xs = []
        for si in range(len(steps)):
            special_xs.append(transcript.get_field3())
            if si > 0:
                folded = self._fold_jit(steps[si - 1], steps[si])(
                    layers[si - 1], jnp.asarray(np.array(special_xs[si], np.uint64)),
                )
                layers.append(folded)
            if si < len(steps) - 1:
                src = frimod.group_for_tree(layers[si], steps[si + 1])
                t = self.scheme.commit(src)
                layer_trees.append(t)
                layer_roots.append(t.root())
                transcript.put(self.scheme.root_ints(t.root()))
            else:
                final_np = np.asarray(layers[si])
                for row in final_np:
                    transcript.put([int(v) for v in row])

        self._t("fri_folds", layers[-1])
        # ---- queries
        ys = transcript.get_permutations(s.n_queries, steps[0])
        fri_layers = []
        trees0 = [tree1, tree2, tree3, tree4, self.const_tree]
        q0 = []
        for y in ys:
            row = []
            for t in trees0:
                vals, sib = t.get_group_proof(int(y))
                row.append(MerkleQuery(vals, sib))
            q0.append(row)
        fri_layers.append(LayerQueries(None, q0))
        cur = list(ys)
        for si in range(1, len(steps)):
            cur = [y % (1 << steps[si]) for y in cur]
            qs = []
            for y in cur:
                vals, sib = layer_trees[si].get_group_proof(int(y))
                qs.append(MerkleQuery(vals, sib))
            fri_layers.append(
                LayerQueries(self.scheme.store_root(layer_roots[si]), qs))

        return StarkProof(
            roots=[self.scheme.store_root(t.root())
                   for t in (tree1, tree2, tree3, tree4)],
            evals=[tuple(int(v) for v in e) for e in evals_np],
            fri=fri_layers,
            final_pol=np.asarray(layers[-1]),
            publics=list(publics),
            n_queries=s.n_queries,
            fri_steps=list(steps),
            hash_type=self.scheme.name,
        )

    @functools.lru_cache(maxsize=None)
    def _fold_jit(self, from_bits: int, to_bits: int):
        s = self.setup
        si = s.fri_steps.index(to_bits)
        shift_inv = frimod.coset_shift_inv_at(si, s.n_bits_ext, s.fri_steps)
        w_inv = pow(gl.w(from_bits), gl.P - 2, gl.P)
        fold_bits = from_bits - to_bits
        # the (out,) coset-scale table is host-built and passed at call
        # time — embedded in the graph it is a giant scan the remote AOT
        # compiler cannot survive at 2^20+ (see fold_layer docstring)
        out = 1 << to_bits
        sinv_np = gl.mul(
            nttmod.geometric_powers(w_inv, out, np_backend=True),
            np.uint64(shift_inv))
        fn = jax.jit(
            lambda vals, sx, sg: frimod.fold_layer(
                vals, fold_bits, sx, shift_inv, w_inv, sinv_g=sg))
        sinv_dev = jnp.asarray(sinv_np)
        return lambda vals, sx: fn(vals, sx, sinv_dev)


def _geom3(base3, n):
    """[(1,0,0), base, base^2, ...] for an extension base — (n, 3) scan."""
    seed = jnp.concatenate(
        [gl3.one((1,)), jnp.broadcast_to(base3, (n - 1, 3))], axis=0
    )
    return jax.lax.associative_scan(gl3.mul, seed, axis=0)
