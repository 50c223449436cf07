import time
t0=time.time()
from mdtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
print(f"import+cache {time.time()-t0:.1f}s", flush=True)
t0=time.time(); d=jax.devices(); print(f"devices {d} {time.time()-t0:.1f}s", flush=True)
t0=time.time(); x=jax.block_until_ready(jnp.zeros((8,))+1.0); print(f"first op {time.time()-t0:.1f}s", flush=True)
for i in range(5):
    t0=time.time(); np.asarray(x+float(i)); print(f"op+pull {1e3*(time.time()-t0):.1f}ms", flush=True)
