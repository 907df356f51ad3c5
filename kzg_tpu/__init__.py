"""kzg_tpu — a TPU-native KZG polynomial-commitment library.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ library (uncommitted6453/kzg-commitments: KZG commitments with byte-range
partial-reveal proofs over BN158 / BN254 / BLS12-381, trusted-setup
generation + byte-compatible file persistence, serialization of every object,
CLI and proof-of-storage demo protocol).

Quick start (mirrors the reference README example)::

    import kzg_tpu as kzg
    kzg.init("BN254")
    ts = kzg.trusted_setup(128)
    b = kzg.blob.from_string("hello there")
    p = kzg.poly.from_blob(b)
    c = ts.create_commit(p)
    pi = ts.create_proof(p, 0, 5)                   # prove "hello"
    assert ts.verify_proof(c, pi, kzg.blob.from_string("hello", 0))
"""

from .protocol import api as _api
from .protocol.api import (blob, commit, init, poly, proof,  # noqa: F401
                           trusted_setup)


def __getattr__(name):
    # live module-level constants set by init() (mirrors kzg::CURVE_ORDER_BYTES)
    if name in ("CURVE_ORDER_BYTES", "MAX_CHUNK_BYTES"):
        return getattr(_api, name)
    raise AttributeError(name)
