"""TPU relay recovery probe: tiny jit, retried until it succeeds.
Appends a timestamped line per attempt to the log.  Run with nohup; a
wedged relay makes each attempt hang ~25-30 min then fail UNAVAILABLE."""
import time

t0 = time.time()
while True:
    try:
        import jax  # noqa: F811
        import jax.numpy as jnp

        x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 8))).block_until_ready()
        print(f"[{time.time()-t0:7.0f}s] TPU_OK {float(x.sum())}", flush=True)
        break
    except Exception as e:  # noqa: BLE001
        print(f"[{time.time()-t0:7.0f}s] probe failed: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        time.sleep(240)
