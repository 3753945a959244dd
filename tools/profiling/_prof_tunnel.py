import time
import numpy as np
import jax, jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev)

# compute: chain matmuls, then PULL the result (forces real completion)
a = jnp.ones((2048, 2048), jnp.bfloat16)
f = jax.jit(lambda x: ((x @ x) @ (x @ x)) * 1e-9)
np.asarray(f(a)[0, 0])
t0 = time.perf_counter()
c = a
for _ in range(20):
    c = f(c)
np.asarray(c[0, 0])
per_compute = (time.perf_counter() - t0) / 20 * 1e3
print(f"compute (4x 2048^3 bf16 mm): {per_compute:.2f} ms/iter")

# upload: fresh host buffers each time, then use them on device and pull
imgs = [np.full((480, 640), i, np.uint8) for i in range(20)]
g = jax.jit(lambda x: x.astype(jnp.float32).sum())
np.asarray(g(jax.device_put(imgs[0])))
t0 = time.perf_counter()
outs = [g(jax.device_put(im)) for im in imgs]
np.asarray(outs[-1])
per_upload = (time.perf_counter() - t0) / 20 * 1e3
print(f"upload gray 307KB + tiny reduce: {per_upload:.2f} ms/frame "
      f"({0.307/(per_upload/1e3):.0f} MB/s)")

deps = [np.full((480, 640), i, np.uint16) for i in range(20)]
np.asarray(g(jax.device_put(deps[0])))
t0 = time.perf_counter()
outs = [g(jax.device_put(d)) for d in deps]
np.asarray(outs[-1])
per_upload2 = (time.perf_counter() - t0) / 20 * 1e3
print(f"upload depth 614KB + tiny reduce: {per_upload2:.2f} ms/frame "
      f"({0.614/(per_upload2/1e3):.0f} MB/s)")

# interleave uploads with the compute chain
t0 = time.perf_counter()
c = a
outs = []
for im in imgs:
    c = f(c)
    outs.append(g(jax.device_put(im)))
np.asarray(c[0, 0]); np.asarray(outs[-1])
per_inter = (time.perf_counter() - t0) / 20 * 1e3
print(f"interleaved: {per_inter:.2f} ms/frame "
      f"(no-overlap = {per_compute + per_upload:.2f})")

# pull of a FRESH device-computed array (not host-cached)
h = jax.jit(lambda x, i: x[:600, :2] + i)
np.asarray(h(a.astype(jnp.float32), 0))
t0 = time.perf_counter()
for i in range(20):
    np.asarray(h(a.astype(jnp.float32), i))
print(f"fresh xy-sized pull incl. compute: {(time.perf_counter()-t0)/20*1e3:.2f} ms")

# RTT proxy: tiny fresh pull
h2 = jax.jit(lambda x, i: x[0, 0] + i)
np.asarray(h2(a.astype(jnp.float32), 0))
t0 = time.perf_counter()
for i in range(20):
    np.asarray(h2(a.astype(jnp.float32), i))
print(f"tiny fresh pull: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
