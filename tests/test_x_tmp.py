import random
import jax
import numpy as np
from kzg_tpu.curves.params import get_curve
from kzg_tpu.fields.mont import Field

def test_x():
    random.seed(1234)
    print("backend:", jax.default_backend(), "ndev:", len(jax.devices()))
    cp = get_curve("BN158")
    F = Field(cp.fp)
    m = F.modulus
    av = [random.randrange(m) for _ in range(32)]
    a = F.encode(av)
    print("a devices:", a.devices(), "sharding:", a.sharding)
    dec = F.decode(a)
    import numpy as _np
    raw = _np.asarray(jax.device_get(a))
    print("raw limb max:", raw.max())
    assert dec[1] == av[1], (dec[1], av[1])
