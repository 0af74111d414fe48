"""Relay-tunnel wire microbenchmark: per-dispatch cost, fetch RTT,
upload/download bandwidth.  Run on the real TPU env (no JAX_PLATFORMS
override); prints 5 one-line figures.  Used to attribute load_extract
wall to wire terms (BASELINE.md round-4) -- the tunnel drifts session
to session, so re-run alongside any cross-session comparison."""
import time, numpy as np
import jax, jax.numpy as jnp
d = jax.devices()[0]
f = jax.jit(lambda x: x + 1)
x = jnp.zeros(128, jnp.int32)
np.asarray(f(x)[:1])  # warm
# 1) dispatch-only cost: 30 chained tiny dispatches, one sync at end
t0 = time.time()
y = x
for _ in range(30):
    y = f(y)
np.asarray(y[:1])
print("chain30_small_dispatch_s", round(time.time() - t0, 3))
# 2) independent dispatches (no data dep), one sync
t0 = time.time()
outs = [f(x) for _ in range(30)]
np.asarray(outs[-1][:1]); [np.asarray(o[:1]) for o in outs]
print("indep30_small_dispatch_s", round(time.time() - t0, 3))
# 3) upload bandwidth: 8 x 1 MB
blobs = [np.random.randint(0, 255, 1 << 20, dtype=np.uint8) for _ in range(8)]
g = jax.jit(lambda b: b.sum())
np.asarray(g(jnp.asarray(blobs[0])))  # warm
t0 = time.time()
arrs = [jnp.asarray(b) for b in blobs]
s = [g(a) for a in arrs]
_ = [np.asarray(v) for v in s]
print("upload_8MB_s", round(time.time() - t0, 3))
# 4) download bandwidth: 13 MB in one fetch
h = jax.jit(lambda b: jnp.tile(b, 13))
big = h(jnp.asarray(blobs[0]))
np.asarray(big[:1])
t0 = time.time()
_ = np.asarray(big)
print("download_13MB_s", round(time.time() - t0, 3))
# 5) small fetch RTT x 10
t0 = time.time()
for o in outs[:10]:
    np.asarray(o[:1])
print("fetch10_small_s", round(time.time() - t0, 3))
