import sys; sys.path.insert(0, "/root/repo")
import json, time, sys
import jax, jax.numpy as jnp, numpy as np
from libdogleg_tpu.utils.benchtime import measure_loop

n, b = 2048, 8
key = jax.random.PRNGKey(0)
A = jax.random.normal(key, (b, n, n), dtype=jnp.float32)
spd = jnp.matmul(A, jnp.swapaxes(A, -1, -2)) + n * jnp.eye(n, dtype=jnp.float32)
flops = b * n**3 / 3

def run(name, fn):
    t0 = time.time()
    out = jax.block_until_ready(jax.jit(fn)(spd))
    L = np.asarray(out[0] if isinstance(out, tuple) else out)
    ref = np.linalg.cholesky(np.asarray(spd, dtype=np.float64))
    err = np.max(np.abs(np.tril(L) - ref) / (1 + np.abs(ref)))
    dt = measure_loop(fn, spd)
    print(json.dumps({"name": name, "dt_ms": round(dt*1e3, 3),
                      "tflops": round(flops/dt/1e12, 3),
                      "max_rel_err": float(err),
                      "compile_s": round(time.time()-t0, 1)}))
    sys.stdout.flush()

from libdogleg_tpu.ops.largechol import large_cholesky
run("lax.linalg", lambda a: jax.vmap(jnp.linalg.cholesky)(a))
run("largechol-pallas", lambda a: jax.vmap(lambda x: large_cholesky(x, panel_impl="pallas")[0])(a))
run("largechol-xla", lambda a: jax.vmap(lambda x: large_cholesky(x, panel_impl="xla")[0])(a))
