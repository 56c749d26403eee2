"""Real-TPU probe for the ``attn_impl=auto`` FORWARD-ONLY policy
(VERDICT r4 "Next round" #4).

The round-4 auto rule ``pallas if (training or b <= 16 or l >= 512)``
extrapolated the ``l >= 512`` inference branch from a TRAINING win at
L=589; no forward-only pallas-vs-XLA number existed at L≥512, and for
the Dh=80 family the pallas path there is the bhld+transpose fallback.
This probe measures forward-only, per head-dim family, at the shapes the
policy actually dispatches:

* Dh=64 (100M/300M): L=197 (T=1), 589 (T=3), 785 (T=4) x b in {8, 64}
* Dh=80 (600M):      L=257 (T=1, merged g=8), 513 (T=2 -> bhld fallback)

Each impl is timed on ITS OWN natural input layout — the model's qkv
projection emits either layout at identical cost (QKVProj heads_first),
so kernel-level timing with per-impl layouts matches the in-model
choice. Chained via lax.scan with a scalar fetch (CLAUDE.md timing
rules: block_until_ready through the relay is unreliable).

Output: one JSON line per config -> paste into PERF.md and re-derive
the policy constants in models/prithvi.py.
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

REPS = 32
CONFIGS = [
    # (b, h, l, d, tag)
    (8, 12, 197, 64, "100M T=1 small-batch"),
    (8, 12, 589, 64, "100M T=3 small-batch"),
    (64, 12, 589, 64, "100M T=3"),
    (64, 12, 785, 64, "100M T=4"),
    (64, 16, 589, 64, "300M T=3"),
    (64, 16, 257, 80, "600M T=1 (merged g=8)"),
    (8, 16, 513, 80, "600M T=2 small-batch (bhld fallback)"),
    (64, 16, 513, 80, "600M T=2 (bhld fallback)"),
    # Round-5b: the l>=512 inference branch at SERVING batch sizes —
    # XLA won back at L=197/b=512, so check it doesn't at long L.
    (256, 12, 589, 64, "100M T=3 serving batch"),
    (128, 12, 785, 64, "100M T=4 serving batch"),
]


def chain_pallas(b, h, l, d):
    def run(q, k, v):
        def body(c, _):
            o = flash_attention_blo(c[0], c[1], c[2])  # (B, L, H*D)
            o = o.reshape(b, l, h, d).transpose(0, 2, 1, 3)
            # feed back so iterations are serialized, cast keeps dtype
            return (c[0] + o.astype(c[0].dtype) * 1e-6, c[1], c[2]), None

        (q, _, _), _ = jax.lax.scan(body, (q, k, v), None, length=REPS)
        return q.astype(jnp.float32).sum()

    return jax.jit(run)


def chain_xla(b, h, l, d):
    def run(q, k, v):  # (B, L, H, D) layout
        def body(c, _):
            o = attention_reference(c[0], c[1], c[2])  # (B, L, H, D)
            return (c[0] + o.astype(c[0].dtype) * 1e-6, c[1], c[2]), None

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
        t_p = time_fn(chain_pallas(b, h, l, d), (qp, kp, vp))
        t_x = time_fn(chain_xla(b, h, l, d), (qx, kx, vx))
        print(json.dumps({
            "tag": tag, "b": b, "h": h, "l": l, "d": d,
            "merged_supported": blo_supported(h, l, d),
            "pallas_ms": round(t_p, 3), "xla_ms": round(t_x, 3),
            "pallas_over_xla": round(t_p / t_x, 3),
            "winner": "pallas" if t_p < t_x else "xla",
        }), flush=True)


if __name__ == "__main__":
    main()
