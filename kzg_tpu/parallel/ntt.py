"""Distributed NTT over a device mesh (four-step / Bailey decomposition).

The single-device NTT (ops.poly.PolyEngine.ntt) runs butterfly stages over
the whole coefficient axis; past one chip's HBM the axis must shard. The
classic TPU-shaped answer is the four-step algorithm: with n = D * n2 and
the coefficient axis contiguously block-sharded over D devices,

    X[k2 + n2*k1] = sum_{j1} w^(n2*j1*k1) * w^(j1*k2)
                    * sum_{j2} x[j1 + D*j2] * (w^D)^(j2*k2)

  1. one all_to_all re-stripes the blocks so device j1 holds the strided
     residue class {j : j = j1 mod D}  (pure ICI traffic, no host);
  2. each device runs a LOCAL length-n2 NTT (the full butterfly pipeline of
     ops.poly, with root w^D — identical to the canonical size-n2 root since
     ntt_root(k)^2 = ntt_root(k-1));
  3. a pointwise twiddle by w^(j1*k2) (row picked by axis_index);
  4. an all_gather + length-D combine across devices (the outer NTT; D is
     the mesh size, so this is a handful of fused multiply-adds per device)
     leaves X contiguously sharded on k — ready for the pointwise product
     of a sharded convolution without any reshuffle.

The reference has no distributed transform at all (NTL ZZ_pX is a
single-thread CPU engine; the only threading is the trusted-setup fan-out,
trusted_setup.cpp:39-73).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..fields.mont import ints_to_limbs
from ..ops.poly import PolyEngine


class DistributedNTT:
    """Callable NTT/INTT over `mesh` for power-of-2 sizes n with
    (mesh size)^2 | n. Input/output: (L, n) arrays, contiguously sharded
    (or shardable) on the last axis."""

    def __init__(self, pe: PolyEngine, mesh: Mesh, axis_name: str = "data"):
        self.pe = pe
        self.F = pe.F
        self.mesh = mesh
        self.axis = axis_name
        self.D = int(np.prod(mesh.devices.shape))
        self._tables = {}

    def _consts(self, n: int, inverse: bool):
        """(tw (L, D, n2), W (L, D, D)) Montgomery twiddle tables."""
        key = (n, inverse)
        if key not in self._tables:
            D, r, F = self.D, self.pe.r, self.F
            n2 = n // D
            k = n.bit_length() - 1
            w = self.pe.cp.ntt_root(k)
            if inverse:
                w = pow(w, -1, r)
            mont = F.params.mont_r
            tw = [pow(w, j1 * k2, r) * mont % r
                  for j1 in range(D) for k2 in range(n2)]
            scale = pow(D, -1, r) if inverse else 1   # local INTT only
            W = [pow(w, n2 * j1 * k1, r) * scale * mont % r
                 for k1 in range(D) for j1 in range(D)]
            self._tables[key] = (
                jnp.asarray(ints_to_limbs(tw, F.L)).reshape(F.L, D, n2),
                jnp.asarray(ints_to_limbs(W, F.L)).reshape(F.L, D, D))
        return self._tables[key]

    def __call__(self, x, inverse: bool = False):
        F, D, ax = self.F, self.D, self.axis
        L, n = x.shape
        n2 = n // D
        assert n == D * n2 and n2 % D == 0, \
            "need (mesh size)^2 | n for the stride re-shard"
        tw, W = self._consts(n, inverse)
        pe = self.pe

        def local(xb, twc, Wc):
            me = jax.lax.axis_index(ax)
            # 1. re-stripe: contiguous block -> residue class j = me (mod D)
            t = xb.reshape(L, n2 // D, D)
            t = jax.lax.all_to_all(t, ax, split_axis=2, concat_axis=1)
            row = t.reshape(L, n2)                     # x[me + D*j2]
            # 2. local butterflies, root w^D == canonical size-n2 root
            T = pe.ntt(row, inverse=inverse)
            # 3. twiddle w^(me*k2)
            myt = jax.lax.dynamic_index_in_dim(twc, me, axis=1,
                                               keepdims=False)
            T = F.mul(T, myt)
            # 4. outer length-D NTT: gather rows, combine with my W row
            allT = jax.lax.all_gather(T, ax)            # (D, L, n2)
            myW = jax.lax.dynamic_index_in_dim(Wc, me, axis=1,
                                               keepdims=False)  # (L, D)
            acc = None
            for j1 in range(D):
                term = F.mul(allT[j1], myW[..., j1:j1 + 1])
                acc = term if acc is None else F.add(acc, term)
            return F.freshen(acc)                       # X[me*n2 + k2]

        f = shard_map(local, mesh=self.mesh,
                      in_specs=(P(None, ax), P(None, None, None),
                                P(None, None, None)),
                      out_specs=P(None, ax), check_vma=False)
        return f(x, tw, W)

    def conv(self, a, b, out_n: int):
        """Sharded convolution: NTT both, pointwise product (stays sharded),
        inverse NTT; result truncated to out_n."""
        n = a.shape[-1]
        fa = self(a)
        fb = self(b)
        prod = self.F.mul(fa, fb)
        return self(prod, inverse=True)[..., :out_n]
