"""Real-TPU probe: q-blocked merged-output kernel vs the bhld+transpose
fallback vs XLA at the Dh=80 multi-temporal shapes (600M T=2/T=3).

The full-L merged kernel is VMEM-illegal at g=8/L>=513 (Mosaic compile
OOM, probe_merged_g8_l513.py); the q-blocked variant (ops/attention.py
``_flash_bloq``) shrinks the per-pair score scratch to (Bq, L) while
keeping the zero-HBM-transpose merged layout. This probe times all
three paths fwd-only and fwd+bwd; if the q-blocked kernel beats the
fallback it becomes ``flash_attention_blo``'s dispatch for these shapes
(it already is — this probe validates the choice and records numbers).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import instageo_tpu.ops.attention as A
from instageo_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache(None)

REPS = 16


def merged(q, k, v):
    b, h, l, d = q.shape
    return A._flash_bloq(q, k, v)


def fallback(q, k, v):
    b, h, l, d = q.shape
    out = A.flash_attention_bhld(q, k, v)
    return out.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def xla(q, k, v):  # heads-first in, merged out — same interface
    b, h, l, d = q.shape
    qt, kt, vt = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    return A.attention_reference(qt, kt, vt).reshape(b, l, h * d)


def chain_fwd(fn, b, h, l, d):
    def run(q, k, v):
        def body(c, _):
            o = fn(c[0], c[1], c[2]).reshape(b, l, h, d).transpose(0, 2, 1, 3)
            return (c[0] + o.astype(c[0].dtype) * jnp.bfloat16(1e-6),
                    c[1], c[2]), None

        (q, _, _), _ = jax.lax.scan(body, (q, k, v), None, length=REPS)
        return q.astype(jnp.float32).sum()

    return jax.jit(run)


def chain_grad(fn, b, h, l, d):
    def loss(q, k, v):
        return (fn(q, k, v).astype(jnp.float32) ** 2).sum()

    def run(q, k, v):
        def body(c, _):
            q, k, v = c
            _, vjp = jax.vjp(loss, q, k, v)
            dq, dk, dv = vjp(jnp.float32(1.0))
            eps = jnp.bfloat16(1e-6)
            return (q + dq.astype(q.dtype) * eps,
                    k + dk.astype(k.dtype) * eps,
                    v + dv.astype(v.dtype) * eps), None

        (q, _, _), _ = jax.lax.scan(body, (q, k, v), None, length=REPS)
        return q.astype(jnp.float32).sum()

    return jax.jit(run)


def time_fn(fn, args):
    float(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append((time.perf_counter() - t0) / REPS * 1e3)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    for (b, h, l, d) in [(64, 16, 513, 80), (32, 16, 769, 80),
                         (16, 16, 1025, 80)]:
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
                   for _ in range(3))
        ref = jax.jit(xla)(q, k, v).astype(jnp.float32)
        out = jax.jit(merged)(q, k, v).astype(jnp.float32)
        diff = float(jnp.max(jnp.abs(out - ref)))
        row = {"shape": [b, h, l, d],
               "plan": A._qblock_plan(h, l, d), "max_diff": round(diff, 4)}
        for name, fn in (("qblock", merged), ("fallback", fallback),
                         ("xla", xla)):
            for kind, chain in (("fwd", chain_fwd), ("fwdbwd", chain_grad)):
                try:
                    row[f"{name}_{kind}_ms"] = round(
                        time_fn(chain(fn, b, h, l, d), (q, k, v)), 3)
                except Exception as e:
                    row[f"{name}_{kind}_ms"] = f"ERR: {str(e)[:120]}"
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
