"""Real-TPU probe: can the merged-output kernel take g=8 at L=513/Dh=80?

g=8 x Dh=80 = 640 lanes (5x128, Mosaic-legal) — the only thing keeping
600M T=2 off the zero-transpose merged kernel is the VMEM grouping cap
(`_group_heads`: 4 for 384<L<=768), set from the L² f32 score scratch.
But the per-pair scratch inside the unrolled group loop may be REUSED
across iterations by Mosaic, in which case peak VMEM is ~1 pair's
(L,L) f32 (513² x 4 = 1.05 MB ... x2 for exp) + the (1,8,513,80) bf16
blocks (~0.7 MB each) — well under the ~16 MB/core budget. If it
compiles and beats the bhld+transpose fallback (8.962 ms fwd+bwd at
b=64, PERF.md "Attention auto policy"), raise the cap for aligned
Dh=80 groupings. Also tries g=8 at L=769 (600M T=3).
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import instageo_tpu.ops.attention as A
from instageo_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache(None)

REPS = 16


def force_group(g):
    """Monkeypatch the grouping caps to force g for the probe."""
    A._group_heads = lambda h, l, d, _g=g: _g if h % _g == 0 else None
    A._merged_grouping = A._group_heads


ORIG_GH, ORIG_MG = A._group_heads, A._merged_grouping


def chain_grad(fn, b, h, l, d):
    def loss(q, k, v):
        o = fn(q, k, v)
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
    float(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append((time.perf_counter() - t0) / REPS * 1e3)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    for (b, h, l, d) in [(64, 16, 513, 80), (32, 16, 769, 80)]:
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
                   for _ in range(3))
        # Correctness anchor from the (group-free) reference path.
        ref = A.attention_reference(*(t.transpose(0, 2, 1, 3)
                                      for t in (q, k, v)))
        ref = jnp.reshape(ref, (b, l, h * d)).astype(jnp.float32)
        for g in (8, 4):
            if (g * d) % 128 != 0:
                continue
            force_group(g)
            try:
                t0 = time.perf_counter()
                out = jax.jit(functools.partial(A._flash_blo_merged,
                                                interpret=False))(q, k, v)
                diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
                compile_s = time.perf_counter() - t0
                t_fb = time_fn(chain_grad(A._flash_blo_merged, b, h, l, d),
                               (q, k, v))
                print(json.dumps({
                    "shape": [b, h, l, d], "g": g, "ok": True,
                    "max_diff": round(diff, 4),
                    "fwdbwd_ms": round(t_fb, 3),
                    "compile_s": round(compile_s, 1),
                }), flush=True)
            except Exception as e:  # Mosaic VMEM OOM / lowering error
                print(json.dumps({
                    "shape": [b, h, l, d], "g": g, "ok": False,
                    "err": str(e)[:200],
                }), flush=True)
            finally:
                A._group_heads, A._merged_grouping = ORIG_GH, ORIG_MG


if __name__ == "__main__":
    main()
