import os

# Tests always run on CPU with a virtual 8-device mesh for sharding tests.
# The session environment pins JAX_PLATFORMS=axon (tunneled remote TPU) and
# a sitecustomize registers the axon PJRT plugin in every interpreter;
# initializing it makes a TPU *claim* through the relay, which serializes
# and stalls every process.  Hard-override the platform AND drop the axon
# backend factory so tests never touch the tunnel (TPU = benchmarks only,
# invoked with the real env).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402  (already imported by sitecustomize with env platform)
import jax._src.xla_bridge as _xb  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_xb._backend_factories.pop("axon", None)

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
