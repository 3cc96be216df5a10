import sys; sys.path.insert(0, "/root/repo")
import json, time
import jax, jax.numpy as jnp, numpy as np
from libdogleg_tpu.utils.benchtime import measure_loop
from libdogleg_tpu.ops.pallas_panelchol import panel_factor

for p in (256, 512):
    b = 8
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (b, p, p), dtype=jnp.float32)
    spd = jnp.matmul(A, jnp.swapaxes(A, -1, -2)) + p * jnp.eye(p, dtype=jnp.float32)
    out = jax.block_until_ready(jax.jit(panel_factor)(spd))
    L = np.asarray(out[0]); Li = np.asarray(out[1])
    ref = np.linalg.cholesky(np.asarray(spd, np.float64))
    err = np.max(np.abs(np.tril(L) - ref) / (1 + np.abs(ref)))
    ierr = np.max(np.abs(Li @ L - np.eye(p)))
    dt = measure_loop(lambda x: panel_factor(x), spd)
    print(json.dumps({"p": p, "b": b, "dt_us": round(dt*1e6, 1),
                      "err": float(err), "inv_err": float(ierr)}))
    sys.stdout.flush()
