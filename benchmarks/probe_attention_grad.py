"""Real-TPU probe: fwd+bwd (training) pallas-vs-XLA at the Dh=80 shapes
the forward probe (probe_attention_policy.py) left open.

The round-5 forward probe found (a) XLA wins forward-only for the 600M
merged g=8 shape (L=257, b=64: pallas 1.15x slower) and (b) the
bhld+transpose FALLBACK wins forward-only at the unsupported 600M T=2
shape (L=513, b=64: pallas 0.77x). The training branch of the auto
policy needs the fwd+bwd numbers: the merged kernel's backward is
transpose-free but the fallback's backward pays the twin HBM transpose.

Timed via jax.vjp chained through lax.scan (data dependency on all of
dq/dk/dv so the backward cannot be dead-code-eliminated), scalar fetch
(CLAUDE.md timing rules). Also re-times the 100M L=197 / L=589 training
shapes as sanity anchors against the round-4 full-step wins.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from instageo_tpu.ops.attention import (
    attention_reference,
    blo_supported,
    flash_attention_blo,
)
from instageo_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache(None)

REPS = 16
CONFIGS = [
    # (b, h, l, d, tag)
    (64, 12, 197, 64, "100M T=1 train anchor"),
    (64, 12, 589, 64, "100M T=3 train anchor"),
    (64, 16, 257, 80, "600M T=1 train (merged g=8)"),
    (64, 16, 513, 80, "600M T=2 train (bhld fallback)"),
]


def chain_pallas_grad(b, h, l, d):
    def loss(q, k, v):
        o = flash_attention_blo(q, k, v)  # (B, L, H*D)
        return (o.astype(jnp.float32) ** 2).sum()

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


def chain_xla_grad(b, h, l, d):
    def loss(q, k, v):  # (B, L, H, D) layout
        o = attention_reference(q, k, v)
        return (o.astype(jnp.float32) ** 2).sum()

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
    float(fn(*args))  # warm/compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append((time.perf_counter() - t0) / REPS * 1e3)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    for b, h, l, d, tag in CONFIGS:
        qp, kp, vp = (jnp.asarray(rng.normal(size=(b, h, l, d)),
                                  jnp.bfloat16) for _ in range(3))
        qx, kx, vx = (t.transpose(0, 2, 1, 3) for t in (qp, kp, vp))
        t_p = time_fn(chain_pallas_grad(b, h, l, d), (qp, kp, vp))
        t_x = time_fn(chain_xla_grad(b, h, l, d), (qx, kx, vx))
        print(json.dumps({
            "tag": tag, "b": b, "h": h, "l": l, "d": d,
            "merged_supported": blo_supported(h, l, d),
            "pallas_fwdbwd_ms": round(t_p, 3), "xla_fwdbwd_ms": round(t_x, 3),
            "pallas_over_xla": round(t_p / t_x, 3),
            "winner": "pallas" if t_p < t_x else "xla",
        }), flush=True)


if __name__ == "__main__":
    main()
