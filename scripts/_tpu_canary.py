import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
x = jnp.arange(1024, dtype=jnp.float32)
print("sum:", float(x.sum()), flush=True)
