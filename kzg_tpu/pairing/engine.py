"""Optimal-ate pairing on TPU: twist-side Miller loop + final exponentiation.

Mirrors the role of MIRACL's PAIR_ate / PAIR_fexp (reference verify path,
src/trusted_setup.cpp:241-253) with a TPU-shaped dataflow:

  * the Miller variable T stays on the sextic twist E'(Fp2) in projective
    coordinates — doubling/addition reuse the complete RCB formulas of
    groups.ec (no inversions anywhere in the loop);
  * line functions are evaluated in *sparse* Fp12 form (three Fp2
    coefficients at twist-type-dependent s-positions); common Fp2/Fp6
    factors are dropped (denominator elimination — killed by the easy part
    of the final exponentiation since [Fp12 : Fp6] = 2);
  * the loop runs as one lax.scan over the static bit pattern of |6u+2|
    (BN) or |u| (BLS12), computing the add-step unconditionally and
    selecting by bit — branchless;
  * the final exponentiation is the easy part (conj / inv / two Frobenii)
    followed by a joint 4-digit base-p square-and-multiply scan of the hard
    exponent (p^4 - p^2 + 1)/r.

The twist Frobenius endomorphism psi (needed for the two BN tail addition
steps) is *derived numerically at build time* from the oracle tower and
verified against pi on the untwisted curve — no hand-copied constants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.params import CurveParams
from ..refmodel import model as rm
from .tower import Fp12Ops


def _bits_msb(n: int):
    return np.array([(n >> i) & 1 for i in range(n.bit_length() - 1, -1, -1)],
                    dtype=np.bool_)


class PairingEngine:
    def __init__(self, ctx):
        """ctx: kzg_tpu.context.CurveContext (uses fp, fp2, g2 curve)."""
        cp: CurveParams = ctx.cp
        self.cp = cp
        self.ctx = ctx
        self.f2 = ctx.fp2
        self.g2 = ctx.g2
        self.t12 = Fp12Ops(ctx.fp2, cp.xi)
        p = cp.p

        # ---- loop scalar ----
        c = 6 * cp.u + 2 if cp.family == "bn" else cp.u
        self.loop_neg = c < 0
        self.loop_bits = _bits_msb(abs(c))

        # ---- Frobenius gamma table for Fp12 (coeff k *= xi^(k(p-1)/6)) ----
        tw = rm.Tower(cp)
        gammas = rm.frobenius_gammas(tw)          # xi^(k(p-1)/6), k=1..5
        gl = [(1, 0)] + gammas
        self.gamma_c = self.f2.encode(gl)         # (2, L, 6)

        # ---- twist Frobenius psi constants (derived + verified) ----
        self._orc = rm.Pairing(cp)
        cx, cy = self._derive_psi(tw)
        self.psi_cx, self.psi_cy = cx, cy         # python int pairs
        self.psi_cx_c = self.f2.encode([cx])[..., 0]
        self.psi_cy_c = self.f2.encode([cy])[..., 0]

        # ---- hard-part digits of (p^4 - p^2 + 1)/r in base p ----
        # Stored as one 4-bit subset index per exponent bit position
        # (MSB first): row j selects which of the four Frobenius powers
        # g_i = f^(p^i) are multiplied in after the j-th squaring. The
        # final_exp scan gathers the precomputed subset product from a
        # 16-entry table, so each step is one squaring + one Fp12 mul
        # instead of four select-guarded muls.
        digs = self._orc.hard_digits              # 4 ints < p
        nbit = max(d.bit_length() for d in digs)
        idx = np.zeros((nbit,), dtype=np.int32)
        for i, d in enumerate(digs):
            for j in range(nbit):
                idx[nbit - 1 - j] |= ((d >> j) & 1) << i
        self.hard_idx = idx

        # sparse line s-positions by twist type (see miller())
        self.pos = (0, 1, 3) if cp.twist == "D" else (0, 3, 5)

    # ------------------------------------------------------------------
    def _derive_psi(self, tw):
        """Find (cx, cy) with psi(x', y') = (conj(x') cx, conj(y') cy) on the
        twist satisfying untwist(psi Q) = pi(untwist Q); verified on G2."""
        orc = self._orc
        cp = self.cp
        og2 = rm.G2(cp)
        Q = og2.gen
        U = orc.untwist(Q)
        piU = orc.frob_g2(U, 1)
        # invert the untwist map on pi(untwist(Q)) to get the target twist
        # point, then read off the per-coordinate Fp2 scalars
        tgt = self._untwist_inv(tw, piU)
        cx = tw.e2_mul(tgt[0], tw.e2_inv(tw.e2_conj(Q[0])))
        cy = tw.e2_mul(tgt[1], tw.e2_inv(tw.e2_conj(Q[1])))
        # verify on a second point
        Q2 = og2.mul(987654321, og2.gen)
        t2 = self._untwist_inv(tw, orc.frob_g2(orc.untwist(Q2), 1))
        assert t2[0] == tw.e2_mul(tw.e2_conj(Q2[0]), cx), "psi cx mismatch"
        assert t2[1] == tw.e2_mul(tw.e2_conj(Q2[1]), cy), "psi cy mismatch"
        return cx, cy

    def _untwist_inv(self, tw, U12):
        """Invert the untwist map: Fp12 point -> twist (Fp2) point.
        untwist multiplies coords by s2 / s3 (refmodel Pairing.__init__), so
        divide and extract the single nonzero Fp2 coefficient."""
        orc = self._orc
        xs = tw.e12_mul(U12[0], tw.e12_inv(orc.s2))
        ys = tw.e12_mul(U12[1], tw.e12_inv(orc.s3))
        cx = tw.e12_coeffs(xs)
        cyc = tw.e12_coeffs(ys)
        assert all(c == (0, 0) for c in cx[1:]), "untwist_inv x not scalar"
        assert all(c == (0, 0) for c in cyc[1:]), "untwist_inv y not scalar"
        return (cx[0], cyc[0])

    # ------------------------------------------------------------------
    # device-side psi on twist points (projective; Z is Fp2 too)
    # ------------------------------------------------------------------
    def _psi(self, Q):
        F2 = self.f2
        cxx = self.psi_cx_c.reshape(
            self.psi_cx_c.shape[:2] + (1,) * (Q["x"].ndim - 2))
        cyy = self.psi_cy_c.reshape(
            self.psi_cy_c.shape[:2] + (1,) * (Q["y"].ndim - 2))
        return {"x": F2.mul(F2.conj(Q["x"], 32),
                            jnp.broadcast_to(cxx, Q["x"].shape)),
                "y": F2.mul(F2.conj(Q["y"], 32),
                            jnp.broadcast_to(cyy, Q["y"].shape)),
                "z": F2.conj(Q["z"], 32)}

    # ------------------------------------------------------------------
    # line evaluation (sparse)
    # ------------------------------------------------------------------
    def _line_dbl(self, T, xp_e, yp_e):
        """Tangent line at projective twist point T, evaluated at affine G1
        point (xp, yp); returns sparse terms [(pos, c2), ...].
        N = 3X^2, D = 2YZ; coefficients (D Z) yp, -(N Z) xp, (N X - D Y)."""
        F2 = self.f2
        X, Y, Z = T["x"], T["y"], T["z"]
        N = F2.mul_small(F2.sqr(X), 3)
        D = F2.mul_small(F2.mul(Y, Z), 2)
        c_y = F2.mul_base(F2.mul(D, Z), yp_e)             # * yp
        c_x = F2.neg(F2.mul_base(F2.mul(N, Z), xp_e), k=16)
        c_1 = F2.sub(F2.mul(N, X), F2.mul(D, Y), k=16)
        return self._assemble(c_y, c_x, c_1)

    def _line_add(self, T, Qx, Qy, xp_e, yp_e):
        """Chord line through T (projective) and Q (affine twist point)."""
        F2 = self.f2
        X, Y, Z = T["x"], T["y"], T["z"]
        N = F2.sub(Y, F2.mul(Qy, Z), k=16)
        D = F2.sub(X, F2.mul(Qx, Z), k=16)
        c_y = F2.mul_base(D, yp_e)
        c_x = F2.neg(F2.mul_base(N, xp_e), k=16)
        c_1 = F2.sub(F2.mul(N, Qx), F2.mul(D, Qy), k=32)
        return self._assemble(c_y, c_x, c_1)

    def _assemble(self, c_y, c_x, c_1):
        """Place the three Fp2 coefficients at twist-dependent s-positions.
        D-twist: l = c_y + c_x s + c_1 s^3;  M-twist: multiply the affine
        line by xi: l = xi c_y + c_1 s^3 + c_x s^5."""
        if self.cp.twist == "D":
            return [(0, c_y), (1, c_x), (3, c_1)]
        t12 = self.t12
        return [(0, t12._xi_mul(c_y)), (3, c_1), (5, c_x)]

    # ------------------------------------------------------------------
    def miller(self, Q, P_affine):
        """Miller loop; Q = projective twist point batch (any batch shape,
        broadcast against P), P_affine = (xp, yp) base-field tensors
        (L, *batch). Returns Fp12 with the same batch."""
        t12, g2 = self.t12, self.g2
        xp, yp = P_affine
        batch = Q["x"].shape[2:]
        bits = jnp.asarray(self.loop_bits[1:])

        def body(carry, bit):
            T, f = carry
            # doubling step
            terms = self._line_dbl(T, xp, yp)
            T2 = g2.dbl(T)
            f2v = t12.mul_sparse(t12.sqr(f), terms)
            # addition step (unconditional compute, select by bit)
            terms_a = self._line_add(T2, Q["x"], Q["y"], xp, yp)
            Ta = g2.add(T2, Q)
            fa = t12.mul_sparse(f2v, terms_a)
            T = g2.select(bit, Ta, T2)
            f = t12.select(bit, fa, f2v)
            return (T, f), None

        T0 = {k: v for k, v in Q.items()}
        (T, f), _ = jax.lax.scan(body, (T0, t12.one(batch)), bits)

        if self.loop_neg:
            f = t12.conj_s(f)
            T = g2.neg(T)
        if self.cp.family == "bn":
            Q1 = self._psi(Q)
            Q2f = self._psi(Q1)
            nQ2 = g2.neg(Q2f)
            terms = self._line_add(T, Q1["x"], Q1["y"], xp, yp)
            f = t12.mul_sparse(f, terms)
            T = g2.add(T, Q1)
            terms = self._line_add(T, nQ2["x"], nQ2["y"], xp, yp)
            f = t12.mul_sparse(f, terms)
        return f

    # ------------------------------------------------------------------
    def final_exp(self, f):
        t12 = self.t12
        # easy part: f^((p^6 - 1)(p^2 + 1))
        f = t12.mul(t12.conj_s(f), t12.inv(f))
        g = self.gamma_c
        f = t12.mul(t12.frob(t12.frob(f, g), g), f)
        # hard part: joint 4-digit base-p square-and-multiply, windowed:
        # all 16 subset products of {g0..g3} are built once (11 muls), so
        # the 254-step scan pays 1 sqr + 1 gather-mul per bit instead of
        # the naive 1 sqr + 4 select-guarded muls (~2.4x on the verify
        # path's dominant cost).
        g0 = f
        g1 = t12.frob(g0, g)
        g2_ = t12.frob(g1, g)
        g3 = t12.frob(g2_, g)
        batch = f.shape[2:-1]
        one = t12.one(batch)
        # subset products in two BATCHED mul rounds (pairs, then triples +
        # the full product) — 2 traced Fp12 muls instead of 11, keeping the
        # unrolled graph small for CPU-test compiles
        gl = [jnp.broadcast_to(x, one.shape) for x in (g0, g1, g2_, g3)]

        def stk(es):
            return jnp.stack(es, axis=-2)         # new batch axis before s

        p2 = t12.mul(stk([gl[0], gl[0], gl[0], gl[1], gl[1], gl[2]]),
                     stk([gl[1], gl[2], gl[3], gl[2], gl[3], gl[3]]))
        s01, s02, s03, s12, s13, s23 = [p2[..., i, :] for i in range(6)]
        p3 = t12.mul(stk([s01, s01, s02, s12, s01]),
                     stk([gl[2], gl[3], gl[3], gl[3], s23]))
        s012, s013, s023, s123, s0123 = [p3[..., i, :] for i in range(5)]
        tab = [one, gl[0], gl[1], s01, gl[2], s02, s12, s012,
               gl[3], s03, s13, s013, s23, s023, s123, s0123]
        tabs = jnp.stack(tab, axis=0)             # (16, 2, L, *batch, 6)
        idxs = jnp.asarray(self.hard_idx)         # (nbit,)

        def body(acc, i):
            acc = t12.sqr(acc)
            return t12.mul(acc, tabs[i]), None

        acc, _ = jax.lax.scan(body, t12.one(batch), idxs)
        return acc

    # ------------------------------------------------------------------
    def pairing_check(self, Qa, Pa, Qb, Pb):
        """e(Qa, Pa) == e(Qb, Pb)?  — one final exponentiation via
        FE(m_a * conj(m_b)) == 1. Q* are projective twist point dicts
        (batch ()), P* are projective G1 point dicts (converted to affine
        here). Infinity inputs contribute the identity (matching oracle
        ate()). The two Miller loops run as ONE batch-2 loop — the scan
        body is latency-bound at these tiny shapes, so stacking the pairs
        halves the sequential-depth cost."""
        t12 = self.t12
        g1 = self.ctx.g1
        g2 = self.g2
        Q = {k: jnp.stack([Qa[k], Qb[k]], axis=-1) for k in ("x", "y", "z")}
        P = {k: jnp.stack([Pa[k], Pb[k]], axis=-1) for k in ("x", "y", "z")}
        xpa, ypa, infp = g1.to_affine(P)
        infq = g2.is_inf(Q)
        # the Miller add-steps treat Q as an AFFINE twist point (the
        # chord line uses (Qx, Qy) directly against projective T), so a
        # projective Q straight out of the G2 MSM must be normalized —
        # feeding it raw silently corrupts every line evaluation
        qx, qy, _ = g2.to_affine(Q)
        Qaff = g2.from_affine(qx, qy)
        # substitute a harmless generator for degenerate inputs
        gen = self._gen2_dev()
        genb = {k: jnp.broadcast_to(v[..., None], Qaff[k].shape)
                for k, v in gen.items()}
        Qs = g2.select(infq, genb, Qaff)
        m = self.miller(Qs, (xpa, ypa))
        m = t12.select(jnp.logical_or(infp, infq), t12.one((2,)), m)
        ma, mb = m[..., 0, :], m[..., 1, :]
        v = self.final_exp(t12.mul(ma, t12.conj_s(mb)))
        return t12.is_one(v)

    def _gen2_dev(self):
        if not hasattr(self, "_g2gen_cache"):
            # eager numpy->device constant: building this lazily inside a
            # trace would cache a TRACER and poison every later retrace
            with jax.ensure_compile_time_eval():
                self._g2gen_cache = {
                    k: jnp.asarray(v[..., 0]) for k, v in
                    self.g2.encode_points([self.cp.g2]).items()}
        return self._g2gen_cache
