import os, time
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/ardae_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
print("devices:", jax.devices(), flush=True)
from ardae_tpu.models.cdae import MLPGradCARDAE, cdae_loss
from ardae_tpu.ops.fused_dsm_grad2 import fused_cdae_dsm_grad_loss2

KEY = jax.random.PRNGKey(0)
bsz, ssz, zdim, ctx_dim, h, L = 128, 625, 32, 800, 256, 5
module = MLPGradCARDAE(input_dim=zdim, context_dim=ctx_dim, h_dim=h,
                       num_hidden_layers=L, nonlinearity="softplus")
params = module.init(KEY, jnp.zeros((4, zdim)), jnp.zeros((4, ctx_dim)), jnp.zeros((4, 1)))
latent = jax.random.normal(jax.random.PRNGKey(1), (bsz, ssz, zdim))
ctx = jax.random.normal(jax.random.PRNGKey(2), (bsz, ctx_dim))
std = 0.3 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (bsz, ssz, 1)))

def timeit(name, lossfn, p, n=10):
    try:
        @jax.jit
        def chunk(p, k0):
            def body(c, k):
                l, g = jax.value_and_grad(lambda q: lossfn(q, k))(p)
                s = l + sum(jnp.sum(x) for x in jax.tree.leaves(g))
                return c + s, None
            acc, _ = jax.lax.scan(body, 0.0, jax.random.split(k0, n))
            return acc
        t0=time.time(); r = jax.device_get(chunk(p, jax.random.PRNGKey(42))); t_compile=time.time()-t0
        t0=time.time(); r = jax.device_get(chunk(p, jax.random.PRNGKey(43))); dt=time.time()-t0
        print(f"{name:28s} {dt/n*1000:8.2f} ms/step   (compile {t_compile:.1f}s, acc {float(r):.4f})", flush=True)
    except Exception as e:
        print(f"{name:28s} FAILED: {str(e)[:200]}", flush=True)

timeit("XLA fp32", lambda p,k: cdae_loss(module, p, k, latent, ctx, std), params)
for tile in (128, 256):
    for cdt in ("float32", "bfloat16"):
        timeit(f"v2 {cdt[:4]} tile{tile}",
               lambda p,k,t=tile,c=cdt: fused_cdae_dsm_grad_loss2(module, p, k, latent, ctx, std, compute_dtype=c, tile=t),
               params)
