import os

# Tests always run on CPU with a virtual 8-device mesh for sharding tests.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def random_read(rng, L, hp_prob=0.1, n_prob=0.0):
    bases = rng.choice(list("ACGT"), size=L)
    out = []
    for b in bases:
        out.append(b)
        if rng.random() < hp_prob:
            out.extend([b] * rng.integers(1, 6))
    seq = np.array(out)
    if n_prob > 0:
        seq[rng.random(len(seq)) < n_prob] = "N"
    return "".join(seq)
