"""Batched Fp12 arithmetic as a flat degree-6 extension of Fp2.

Since s^2 = v and v^3 = xi, the full tower Fp12 = Fp6[s]/(s^2 - v) collapses
to Fp12 = Fp2[s]/(s^6 - xi).  An Fp12 element is stored as the tensor of its
six Fp2 coefficients with the coefficient index as a (trailing) batch axis:
shape (2, L, *batch, 6).  Multiplication is then one broadcast Fp2 multiply of
all 36 coefficient pairs, a skew-reshape anti-diagonal sum, and one xi-fold —
a handful of fused VPU ops instead of MIRACL's scalar FP12 schoolbook
(reference verify path: PAIR_ate/PAIR_fexp/FP12_equals,
src/trusted_setup.cpp:241-253).

Flat coefficient order matches refmodel.model.Tower.e12_coeffs:
  (a0, b0, a1, b1, a2, b2) = coefficients of s^0..s^5, so even slots are the
  Fp6 = Fp2[v] even subalgebra (used for inversion via the s-conjugate norm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.quadratic import Fp2


class Fp12Ops:
    def __init__(self, f2: Fp2, xi):
        self.f2 = f2
        p = f2.base.modulus
        self.xi_c = f2.encode([(xi[0] % p, xi[1] % p)])[..., 0]   # (2, L)

    # -- construction ----------------------------------------------------
    def zero(self, batch=()):
        return self.f2.zeros((*batch, 6))

    def one(self, batch=()):
        o = self.zero(batch)
        return o.at[..., 0].set(self.f2.ones(batch))

    def embed2(self, x2, pos=0):
        """Fp2 element (2, L, *batch) -> Fp12 with coefficient at s^pos."""
        o = self.zero(x2.shape[2:])
        return o.at[..., pos].set(x2)

    def coeff(self, a, k):
        return a[..., k]

    # -- ring ops ---------------------------------------------------------
    def _xi_mul(self, x):
        c = self.xi_c.reshape(self.xi_c.shape[:2] + (1,) * (x.ndim - 2))
        return self.f2.mul(x, jnp.broadcast_to(c, x.shape))

    def _fold(self, c11):
        """11-coefficient product -> 6 coefficients via s^6 = xi."""
        lo = c11[..., :6]
        hi = self._xi_mul(c11[..., 6:])                   # 5 coeffs
        return lo.at[..., :5].add(hi)

    def mul(self, a, b):
        """Full 6x6 coefficient product in ONE broadcast Fp2 mul, then the
        anti-diagonal skew sum and xi-fold. No norm16 round-trip on the
        output: the summed limbs stay < 2^19 and the value < ~36p, inside
        every consumer's (mul / exact-sub / select) input contract — the
        L-step exact normalization was half the sequential cost of every
        Fp12 op on the latency-bound verify path."""
        F2 = self.f2
        P = F2.mul(a[..., :, None], b[..., None, :])      # (2,L,*b,6,6)
        Pp = jnp.pad(P, [(0, 0)] * (P.ndim - 1) + [(0, 6)])
        flat = Pp.reshape(P.shape[:-2] + (6 * 12,))[..., : 6 * 11]
        skew = flat.reshape(P.shape[:-2] + (6, 11))
        C = jnp.sum(skew.astype(jnp.uint32), axis=-2)
        return self._fold(C)

    def _norm(self, x):
        """Exact 16-bit limb normalization of both Fp components (one
        stacked L-step carry chain)."""
        B = self.f2.base
        return jnp.moveaxis(B._norm16(jnp.moveaxis(x, 0, 1)), 1, 0)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_sparse(self, f, terms):
        """f * sum_k c_k s^(pos_k) for sparse terms [(pos, c2), ...];
        c2 shaped (2, L, *batch). All terms multiply in ONE broadcast Fp2
        mul; the static s-position shifts land in an 11-slot accumulator
        folded once by s^6 = xi (exactly Fp12 mul's tail)."""
        F2 = self.f2
        cs = jnp.stack([c for _, c in terms], axis=-1)    # (2, L, *b, k)
        prod = F2.mul(f[..., None], cs[..., None, :])     # (2, L, *b, 6, k)
        acc = None
        for i, (pos, _) in enumerate(terms):
            t = prod[..., i]                              # (2, L, *b, 6)
            nd1 = t.ndim - 1
            sh = jnp.pad(t, [(0, 0)] * nd1 + [(pos, 5 - pos)])
            acc = sh if acc is None else acc + sh
        return self._fold(acc)

    def conj_s(self, a):
        """a^(p^6): s -> -s (negate odd coefficients)."""
        ev = a[..., 0::2]
        od = self.f2.neg(a[..., 1::2], k=64)
        return jnp.stack([ev, od], axis=-1).reshape(a.shape)

    def frob(self, a, gamma_c):
        """a^p: conjugate every Fp2 coefficient, multiply coeff k by
        gamma_c[..., k] (gamma[0] = 1, gamma[k] = xi^(k (p-1)/6))."""
        ac = self.f2.conj(a, k=64)
        g = gamma_c.reshape(gamma_c.shape[:2] + (1,) * (a.ndim - 3)
                            + (6,))
        return self.f2.mul(ac, jnp.broadcast_to(g, a.shape))

    # -- inversion --------------------------------------------------------
    def _fp6_inv(self, c):
        """Inverse in Fp6 = Fp2[v]/(v^3 - xi); c shaped (2, L, *batch, 3)."""
        F2 = self.f2
        c0, c1, c2 = c[..., 0], c[..., 1], c[..., 2]
        a0 = F2.sub(F2.sqr(c0), self._xi_mul(F2.mul(c1, c2)), k=16)
        a1 = F2.sub(self._xi_mul(F2.sqr(c2)), F2.mul(c0, c1), k=16)
        a2 = F2.sub(F2.sqr(c1), F2.mul(c0, c2), k=16)
        t = F2.add(F2.mul(c0, a0),
                   self._xi_mul(F2.add(F2.mul(c2, a1), F2.mul(c1, a2))))
        ti = F2.inv(t)
        return jnp.stack([F2.mul(a0, ti), F2.mul(a1, ti),
                          F2.mul(a2, ti)], axis=-1)

    def inv(self, a):
        """a^-1 via the s-conjugate norm: a * conj(a) lies in Fp6 (even
        s-coefficients), invert there, multiply back."""
        ac = self.conj_s(a)
        n = self.mul(a, ac)                               # Fp6: odd slots ~ 0
        vi = self._fp6_inv(n[..., 0::2])
        emb = self.zero(a.shape[2:-1])
        emb = emb.at[..., 0::2].set(vi)
        return self.mul(ac, emb)

    # -- predicates -------------------------------------------------------
    def eq(self, a, b):
        return jnp.all(jnp.stack(
            [self.f2.eq(a[..., k], b[..., k]) for k in range(6)]), axis=0)

    def is_one(self, a):
        return self.eq(a, self.one(a.shape[2:-1]))

    def select(self, mask, a, b):
        # extra trailing axis aligns the mask against the s-coefficient axis
        return self.f2.select(jnp.asarray(mask)[..., None], a, b)

    def pow_bits(self, a, bits_np):
        """a^e for a fixed exponent given as MSB-first bit array (numpy)."""
        bits = jnp.asarray(bits_np[1:])

        def body(acc, bit):
            acc = self.sqr(acc)
            return self.select(bit, self.mul(acc, a), acc), None

        acc, _ = jax.lax.scan(body, a, bits)
        return acc
