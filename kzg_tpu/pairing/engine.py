"""Optimal-ate pairing on TPU: twist-side Miller loop + final exponentiation.

Mirrors the role of MIRACL's PAIR_ate / PAIR_fexp (reference verify path,
src/trusted_setup.cpp:241-253) with a TPU-shaped dataflow:

  * the Miller variable T stays on the sextic twist E'(Fp2) in projective
    coordinates — doubling/addition reuse the complete RCB formulas of
    groups.ec (no inversions anywhere in the loop);
  * line functions are evaluated in *sparse* Fp12 form (three Fp2
    coefficients at twist-type-dependent s-positions); common Fp2/Fp6
    factors are dropped (denominator elimination — killed by the final
    exponentiation since [Fp12 : Fp6] = 2);
  * the loop runs as one lax.scan over the static bit pattern of |6u+2|
    (BN) or |u| (BLS12), computing the add-step unconditionally and
    selecting by bit — branchless. The scan body is ROUND-FUSED: the
    group doubling and its tangent line share multiplication rounds (one
    stacked Fp2 mul per round, fields.quadratic.Fp2.mul_many), because at
    pairing batch sizes the device is latency-bound — sequential op count,
    not lanes, is the whole cost;
  * the pairing EQUALITY check skips the final exponentiation's Fp12
    inversion entirely: with u = m_a * conj(m_b), FE(u) == 1 iff
    conj(u)^E == u^E for E = (p^6 + 1)/r (since u^(p^6-1) = conj(u)/u and
    (p^12-1)/r = (p^6-1) * E). Both sides run as ONE 2-lane joint base-p
    digit exponentiation against a 64-entry Frobenius-subset table — no
    easy part, no Fermat inversion chain.

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

        # ---- joint base-p digits of E = (p^6 + 1)/r ----
        # One 6-bit subset index per exponent bit position (MSB first):
        # row j selects which of the six Frobenius powers g_i = u^(p^i)
        # multiply in after the j-th squaring (see _unity_check).
        E = (p ** 6 + 1) // cp.r
        assert E * cp.r == p ** 6 + 1, "r must divide p^6 + 1"
        digs = []
        t = E
        for _ in range(6):
            digs.append(t % p)
            t //= p
        assert t == 0
        nbit = max(d.bit_length() for d in digs)
        idx = np.zeros((nbit,), dtype=np.int32)
        for i, d in enumerate(digs):
            for j in range(nbit):
                idx[nbit - 1 - j] |= ((d >> j) & 1) << i
        self.unity_idx = idx

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
    # fused doubling + tangent-line step (RCB15 Alg 9 for a = 0, shared
    # multiplication rounds with the line coefficients; matches groups.ec
    # Curve.dbl exactly on the group output)
    # ------------------------------------------------------------------
    def _dbl_line(self, T, xp_e, yp_e):
        F2 = self.f2
        X, Y, Z = T["x"], T["y"], T["z"]
        # round 1: all coordinate products for both dbl and tangent line
        t0, t1, zz, xy, xx = F2.mul_many([
            (Y, Y), (Y, Z), (Z, Z), (X, Y), (X, X)])
        N = F2.mul_small(xx, 3)                  # 3 X^2
        D = F2.mul_small(t1, 2)                  # 2 Y Z
        e8 = F2.mul_small(t0, 8)
        # round 2: b3*Z^2 (dbl) + line numerator products
        t2, DZ, NZ, NX, DY = F2.mul_many([
            (zz, self._b3()), (D, Z), (N, Z), (N, X), (D, Y)])
        Y3t = F2.add(t0, t2)
        t2_9 = F2.mul_small(t2, 3)
        t0s = F2.sub(t0, t2_9, k=32)
        # round 3: dbl outputs
        X3, Z3, Ya, Xa = F2.mul_many([
            (t2, e8), (t1, e8), (t0s, Y3t), (t0s, xy)])
        T2 = {"x": F2.mul_small(Xa, 2), "y": F2.add(Ya, X3), "z": Z3}
        # line: c_y = (D Z) yp, c_x = -(N Z) xp, c_1 = N X - D Y
        cy, cx = self._mul_base_pair(DZ, yp_e, NZ, xp_e)
        terms = self._assemble(cy, F2.neg(cx, k=16), F2.sub(NX, DY, k=16))
        return T2, terms

    def _add_line(self, T, Qx, Qy, xp_e, yp_e):
        """Fused chord line + complete add T + Q (Q affine twist point,
        z = 1; RCB15 Alg 7 specialised: matches groups.ec Curve.add with
        Z2 = 1 on the group output)."""
        F2 = self.f2
        X1, Y1, Z1 = T["x"], T["y"], T["z"]
        # round 1: cross products (line needs Qy Z1, Qx Z1 = parts of it)
        t0, t1, QxZ, QyZ, QxY, QyX = F2.mul_many([
            (X1, Qx), (Y1, Qy), (Qx, Z1), (Qy, Z1), (Qx, Y1), (Qy, X1)])
        t3 = F2.add(QxY, QyX)                    # X1 Y2 + X2 Y1
        t4 = F2.add(Y1, QyZ)                     # Y1 Z2 + Y2 Z1  (Z2 = 1)
        t5 = F2.add(X1, QxZ)                     # X1 Z2 + X2 Z1
        N = F2.sub(Y1, QyZ, k=16)                # line numerator
        Dd = F2.sub(X1, QxZ, k=16)
        # round 2: b3 products (group) + line coefficient products
        Ft, G, NQx, DQy = F2.mul_many([
            (Z1, self._b3()), (t5, self._b3()), (N, Qx), (Dd, Qy)])
        Zt = F2.add(t1, Ft)                      # Y1Y2 + 3b Z1Z2
        M = F2.sub(t1, Ft, k=16)
        t0_3 = F2.mul_small(t0, 3)
        # round 3: group outputs
        X3a, X3b, Y3a, Y3b, Z3a, Z3b = F2.mul_many([
            (t3, M), (t4, G), (M, Zt), (t0_3, G), (t4, Zt), (t3, t0_3)])
        T3 = {"x": F2.sub(X3a, X3b, k=16),
              "y": F2.add(Y3a, Y3b),
              "z": F2.add(Z3a, Z3b)}
        cy, cx = self._mul_base_pair(Dd, yp_e, N, xp_e)
        terms = self._assemble(cy, F2.neg(cx, k=16),
                               F2.sub(NQx, DQy, k=32))
        return T3, terms

    def _b3(self):
        """Twist constant 3*b2 as an Fp2 tensor (broadcast by mul_many)."""
        return self.g2._b3

    def _mul_base_pair(self, a2, c_a, b2, c_b):
        """Two Fp2-by-base products as one stacked base mul round."""
        F2 = self.f2
        st = jnp.stack([a2, b2], axis=2)              # (2, L, 2, *batch)
        ce = jnp.stack([c_a, c_b], axis=1)            # (L, 2, *batch)
        out = F2.mul_base(st, ce)
        return out[:, :, 0], out[:, :, 1]

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
        """Miller loop; Q = projective twist point batch with z = 1 (the
        add steps treat Q as affine), any batch shape broadcast against P;
        P_affine = (xp, yp) base-field tensors (L, *batch). Returns Fp12
        with the same batch."""
        t12, g2 = self.t12, self.g2
        xp, yp = P_affine
        batch = Q["x"].shape[2:]
        bits = jnp.asarray(self.loop_bits[1:])

        def body(carry, bit):
            T, f = carry
            # doubling step (group dbl + tangent line, shared rounds)
            T2, terms = self._dbl_line(T, xp, yp)
            f2v = t12.mul_sparse(t12.sqr(f), terms)
            # addition step (unconditional compute, select by bit)
            Ta, terms_a = self._add_line(T2, Q["x"], Q["y"], xp, yp)
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
            # psi outputs are projective with z = conj(1) = 1, so the
            # affine-Q add path stays valid for the two tail steps
            T, terms = self._add_line(T, Q1["x"], Q1["y"], xp, yp)
            f = t12.mul_sparse(f, terms)
            _, terms = self._add_line(T, nQ2["x"], nQ2["y"], xp, yp)
            f = t12.mul_sparse(f, terms)
        return f

    # ------------------------------------------------------------------
    def _unity_check(self, u):
        """FE(u) == 1 without computing FE: check conj(u)^E == u^E for
        E = (p^6+1)/r, as one 2-lane joint base-p-digit exponentiation
        (frobenius powers g_i = u^(p^i), 64-entry subset-product table,
        one squaring + one gathered multiply per exponent bit)."""
        t12 = self.t12
        g = self.gamma_c
        v = jnp.stack([u, t12.conj_s(u)], axis=-2)        # lane axis
        batch = v.shape[2:-1]
        gens = [v]
        for _ in range(5):
            gens.append(t12.frob(gens[-1], g))
        one = t12.one(batch)
        gl = [jnp.broadcast_to(x, one.shape) for x in gens]

        def stk(es):
            return jnp.stack(es, axis=-2)

        pr = t12.mul(stk([gl[0], gl[0], gl[1], gl[3], gl[3], gl[4]]),
                     stk([gl[1], gl[2], gl[2], gl[4], gl[5], gl[5]]))
        s01, s02, s12, s34, s35, s45 = [pr[..., i, :] for i in range(6)]
        pr2 = t12.mul(stk([s01, s34]), stk([gl[2], gl[5]]))
        s012, s345 = pr2[..., 0, :], pr2[..., 1, :]
        A = [one, gl[0], gl[1], s01, gl[2], s02, s12, s012]
        B = [one, gl[3], gl[4], s34, gl[5], s35, s45, s345]
        # full 64-entry table T[hi*8+lo] = A[lo] * B[hi], one stacked round
        Ab = stk([A[i & 7] for i in range(64)])
        Bb = stk([B[i >> 3] for i in range(64)])
        tab = t12.mul(Ab, Bb)
        tabs = jnp.moveaxis(tab, -2, 0)                   # (64, ..., 6)
        idxs = jnp.asarray(self.unity_idx)

        def body(acc, i):
            acc = t12.sqr(acc)
            return t12.mul(acc, tabs[i]), None

        acc, _ = jax.lax.scan(body, t12.one(batch), idxs)
        return t12.eq(acc[..., 0, :], acc[..., 1, :])

    # ------------------------------------------------------------------
    def pairing_check(self, Qa, Pa, Qb, Pb):
        """e(Qa, Pa) == e(Qb, Pb)?  — no final exponentiation at all: the
        two Miller loops run as ONE batch-2 loop (latency-bound at these
        tiny shapes), all four projective inputs affinize through ONE
        batched Fermat inversion, and the FE(m_a/m_b) == 1 condition is
        decided by _unity_check. Q* are projective twist point dicts
        (batch ()), P* are projective G1 point dicts. Infinity inputs
        contribute the identity (matching oracle ate())."""
        t12 = self.t12
        F = self.f2.base
        F2 = self.f2
        g2 = self.g2
        Q = {k: jnp.stack([Qa[k], Qb[k]], axis=-1) for k in ("x", "y", "z")}
        P = {k: jnp.stack([Pa[k], Pb[k]], axis=-1) for k in ("x", "y", "z")}
        infp = F.is_zero(P["z"])
        infq = F2.is_zero(Q["z"])
        # ONE windowed Fermat chain inverts G1 z's and G2 z-norms together
        nrm = F2._norm_val(Q["z"])                        # (L, 2)
        zs = jnp.concatenate([P["z"], nrm], axis=-1)      # (L, 4)
        inv4 = F.batch_inv(zs, axis=1)                    # zeros -> zero
        zi = inv4[..., :2]
        ni = inv4[..., 2:]
        xp = F.mul(P["x"], zi)
        yp = F.mul(P["y"], zi)
        z2inv = F2.mul_base(F2.conj(Q["z"], 32), ni)      # Fp2 inverse of z
        qx, qy = F2.mul_many([(Q["x"], z2inv), (Q["y"], z2inv)])
        Qaff = g2.from_affine(qx, qy)
        # substitute a harmless generator for degenerate inputs
        gen = self._gen2_dev()
        genb = {k: jnp.broadcast_to(v[..., None], Qaff[k].shape)
                for k, v in gen.items()}
        Qs = g2.select(infq, genb, Qaff)
        m = self.miller(Qs, (xp, yp))
        m = t12.select(jnp.logical_or(infp, infq), t12.one((2,)), m)
        ma, mb = m[..., 0, :], m[..., 1, :]
        return self._unity_check(t12.mul(ma, t12.conj_s(mb)))

    def _gen2_dev(self):
        if not hasattr(self, "_g2gen_cache"):
            # eager numpy->device constant: building this lazily inside a
            # trace would cache a TRACER and poison every later retrace
            with jax.ensure_compile_time_eval():
                self._g2gen_cache = {
                    k: jnp.asarray(v[..., 0]) for k, v in
                    self.g2.encode_points([self.cp.g2]).items()}
        return self._g2gen_cache
