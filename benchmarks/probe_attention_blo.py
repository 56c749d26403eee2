"""Real-TPU probe: flash_attention_blo compiles + matches XLA, fwd+bwd timing."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from instageo_tpu.ops.attention import attention_reference, flash_attention_blo
from instageo_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache(None)

B, H, L, D = 128, 12, 197, 64
rng = np.random.default_rng(0)
q, k, v = (jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.bfloat16)
           for _ in range(3))
w = jnp.asarray(rng.normal(size=(H * D,)), jnp.bfloat16)

# correctness fwd
out = jax.jit(flash_attention_blo)(q, k, v)
ref = attention_reference(*(t.transpose(0, 2, 1, 3).astype(jnp.bfloat16)
                            for t in (q, k, v)))
ref = jnp.reshape(ref, (B, L, H * D))
print("fwd max abs diff:",
      float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))))

# correctness bwd


def loss_blo(q, k, v):
    return (flash_attention_blo(q, k, v).astype(jnp.float32)
            * w.astype(jnp.float32)).sum()


def loss_ref(q, k, v):
    o = attention_reference(*(t.transpose(0, 2, 1, 3) for t in (q, k, v)))
    return (o.reshape(B, L, H * D).astype(jnp.float32)
            * w.astype(jnp.float32)).sum()


g1 = jax.jit(jax.grad(loss_blo, argnums=(0, 1, 2)))(q, k, v)
g2 = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
for a, b, n in zip(g1, g2, "qkv"):
    diff = jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
    print(f"d{n} max abs diff:", float(diff))

# timing: chained fwd+bwd, scalar-fetch sync (CLAUDE.md timing rules)


def chain(fn, reps=16):
    def body(c, _):
        dq, dk, dv = jax.grad(fn, argnums=(0, 1, 2))(c[0], c[1], c[2])
        return (c[0] + dq * 1e-6, c[1] + dk * 1e-6, c[2] + dv * 1e-6), None

    def run(q, k, v):
        (q, k, v), _ = jax.lax.scan(body, (q, k, v), None, length=reps)
        return q.astype(jnp.float32).sum()

    return jax.jit(run)


for name, fn in [("blo", loss_blo), ("ref", loss_ref)]:
    r = chain(fn)
    float(r(q, k, v))  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(r(q, k, v))
        ts.append((time.perf_counter() - t0) / 16 * 1e3)
    print(f"{name}: fwd+bwd per iter min {min(ts):.2f} ms, all {[round(t, 2) for t in ts]}")
print("OK")
