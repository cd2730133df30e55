import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ligero_jax_cache_tpu")
exec(open("/root/repo/_mmp.py").read())
