"""Fp2 arithmetic layered on the batched base field.

Element representation: ``uint32[2, L, *batch]`` — component axis first
(c0 + c1*w, w^2 = qnr), then the base field's limb-major layout.  Exposes the
same operation surface as fields.mont.Field so the generic Jacobian group ops
in groups.ec work over either field (G1 over Fp, G2 over Fp2) — replacing the
reference's MIRACL ECP/ECP2 split (config/curve_*/kzg_config.h).
"""

from __future__ import annotations

import jax.numpy as jnp

from .mont import Field


class Fp2:
    def __init__(self, base: Field, qnr: int):
        self.base = base
        self.qnr = qnr % base.modulus
        # -1 is the common case (p = 3 mod 4); mul-by-qnr is then a sub
        self.qnr_is_m1 = (self.qnr == base.modulus - 1)
        if not self.qnr_is_m1:
            self.qnr_small = self.qnr if self.qnr < 16 else None
            if self.qnr_small is None:
                raise NotImplementedError(
                    "qnr must be -1 or small (<16); derived curves satisfy this")

    # -- shape helpers ---------------------------------------------------
    def zeros(self, batch_shape=()):
        return jnp.stack([self.base.zeros(batch_shape)] * 2, axis=0)

    def ones(self, batch_shape=()):
        return jnp.stack([self.base.ones(batch_shape),
                          self.base.zeros(batch_shape)], axis=0)

    def make(self, c0, c1):
        c0, c1 = self.base._bc(c0, c1)
        return jnp.stack([c0, c1], axis=0)

    def encode(self, pairs):
        """[(c0, c1) python ints] -> (2, L, n)."""
        return jnp.stack([self.base.encode([a for a, _ in pairs]),
                          self.base.encode([b for _, b in pairs])], axis=0)

    def decode(self, arr):
        c0 = self.base.decode(arr[0])
        c1 = self.base.decode(arr[1])
        if isinstance(c0, list):
            return list(zip(c0, c1))
        return (c0, c1)

    # -- ring ops --------------------------------------------------------
    def add(self, a, b):
        return jnp.stack([self.base.add(a[0], b[0]),
                          self.base.add(a[1], b[1])], axis=0)

    # Fp2 subs stay on the exact path (lazy=False): the pairing tower's
    # add/fold/conjugate chains are value-calibrated against sub's tight
    # k*p slack (see fields.mont.Field.sub); the lazy path's m*p slack
    # would overflow those budgets.
    def sub(self, a, b, k: int = 16):
        return jnp.stack([self.base.sub(a[0], b[0], k, lazy=False),
                          self.base.sub(a[1], b[1], k, lazy=False)], axis=0)

    def neg(self, a, k: int = 16):
        return jnp.stack([self.base.neg(a[0], k, lazy=False),
                          self.base.neg(a[1], k, lazy=False)], axis=0)

    def conj(self, a, k: int = 16):
        return jnp.stack([a[0], self.base.neg(a[1], k, lazy=False)], axis=0)

    def _mul_qnr(self, x):
        """qnr * x in the base field."""
        if self.qnr_is_m1:
            return self.base.neg(x, lazy=False)
        return self.base.mul_small(x, self.qnr_small)

    def mul(self, a, b):
        """Karatsuba; components of the result are <= 5.6p ("fresh2")."""
        B = self.base
        v0 = B.mul(a[0], b[0])
        v1 = B.mul(a[1], b[1])
        c0 = B.add(v0, self._mul_qnr(v1)) if not self.qnr_is_m1 else \
            B.sub(v0, v1, k=2, lazy=False)
        t = B.mul(B.add(a[0], a[1]), B.add(b[0], b[1]))
        c1 = B.sub(t, B.add(v0, v1), k=4, lazy=False)
        return jnp.stack([c0, c1], axis=0)

    def sqr(self, a):
        return self.mul(a, a)

    def mul_many(self, pairs):
        """Stacked batch of independent Fp2 products (see Field.mul_many);
        the three Karatsuba base muls each see len(pairs)x the lanes."""
        if len(pairs) == 1:
            return [self.mul(*pairs[0])]
        a = jnp.stack([p[0] for p in pairs], axis=2)   # (2, L, k, *batch)
        b = jnp.stack([p[1] for p in pairs], axis=2)
        out = self.mul(a, b)
        return [out[:, :, i] for i in range(len(pairs))]

    def mul_small(self, a, k: int):
        return jnp.stack([self.base.mul_small(a[0], k),
                          self.base.mul_small(a[1], k)], axis=0)

    def freshen(self, a):
        return jnp.stack([self.base.freshen(a[0]),
                          self.base.freshen(a[1])], axis=0)

    def mul_base(self, a, c):
        """Multiply Fp2 element by a base-field element c (limb tensor)."""
        return jnp.stack([self.base.mul(a[0], c),
                          self.base.mul(a[1], c)], axis=0)

    # -- domain conversion (componentwise; for jitted decode boundaries) --
    def from_mont(self, a):
        return jnp.stack([self.base.from_mont(a[0]),
                          self.base.from_mont(a[1])], axis=0)

    def canon(self, a, max_subs: int = 2):
        return jnp.stack([self.base.canon(a[0], max_subs),
                          self.base.canon(a[1], max_subs)], axis=0)

    # -- predicates ------------------------------------------------------
    def is_zero(self, a):
        return jnp.logical_and(self.base.is_zero(a[0]),
                               self.base.is_zero(a[1]))

    def eq(self, a, b):
        return jnp.logical_and(self.base.eq(a[0], b[0]),
                               self.base.eq(a[1], b[1]))

    def select(self, mask, a, b):
        return jnp.stack([self.base.select(mask, a[0], b[0]),
                          self.base.select(mask, a[1], b[1])], axis=0)

    # -- inversion -------------------------------------------------------
    def _norm_val(self, a):
        """a0^2 - qnr a1^2 (the Fp2 norm), base-field element."""
        B = self.base
        t0 = B.sqr(a[0])
        t1 = B.sqr(a[1])
        if self.qnr_is_m1:
            return B.add(t0, t1)
        return B.sub(t0, B.mul_small(t1, self.qnr_small), k=32, lazy=False)

    def inv(self, a):
        B = self.base
        d = B.inv(self._norm_val(a))
        return jnp.stack([B.mul(a[0], d),
                          B.neg(B.mul(a[1], d), lazy=False)], axis=0)

    def batch_inv(self, a, axis=1):
        """axis counts batch axes of the *component* layout (>=1 past limbs),
        i.e. a has shape (2, L, *batch) and axis refers to (L, *batch)."""
        B = self.base
        d = B.batch_inv(self._norm_val(a), axis=axis)
        return jnp.stack([B.mul(a[0], d),
                          B.neg(B.mul(a[1], d), lazy=False)], axis=0)
