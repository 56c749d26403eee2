"""Pipeline parallelism for the Prithvi ViT encoder (GPipe over ICI).

The reference has no model parallelism of any kind (SURVEY.md §2.5 —
single-accelerator Lightning); PP is offered beyond parity, alongside
tp.py/fsdp.py, for scaling variants past one chip's HBM: the encoder's
transformer blocks are split into ``pp`` contiguous stages laid out over a
``pipe`` mesh axis, and microbatches stream through the stages in the
classic GPipe schedule. Stage-to-stage activation hand-off is a single
``lax.ppermute`` per tick, riding one ICI hop on a TPU slice (the ``pipe``
axis is built on the fast/adjacent device axis, like TP's ``model`` axis).

Design (idiomatic SPMD pipelining — the "pipeline emulation on a mesh"
recipe, scaling-book style — NOT a translation of any reference code):

- Block parameters live STACKED: one pytree whose leaves have a leading
  ``depth`` axis (``models/prithvi.py`` ``block_layout="scan"|"pipeline"``),
  sharded ``P("pipe")`` so each device holds ``depth / pp`` layers.
- Inside ``jax.shard_map`` every device runs the same program: scan its
  resident layers over the current microbatch activation, record the
  output if it is the last stage, then ``ppermute`` the activation to the
  next stage. After ``M + pp - 1`` ticks all ``M`` microbatch outputs have
  been collected; a ``psum`` over the pipe axis replicates them (only the
  last stage contributes non-zeros).
- The whole schedule is differentiable (scan + ppermute + psum have exact
  transposes), so the SAME code path serves training: the backward runs
  the reverse pipeline automatically.

Composition: the ``data`` axis of the 2D (data, pipe) mesh carries plain
DP batch sharding; ZeRO-1 moment sharding composes via
``tp.place_state_like_params``. TP over a third axis is not offered —
at Prithvi scale (≤600M) PP×DP already exceeds one host.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instageo_tpu.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def make_mesh_pp(pp: int, num_devices: Optional[int] = None) -> Mesh:
    """(data, pipe) mesh; ``pipe`` is the fast (ICI-adjacent) axis so the
    per-tick activation ppermute is one neighbor hop."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % pp != 0:
        raise ValueError(f"pp={pp} must divide device count {n}")
    grid = np.asarray(devices).reshape(n // pp, pp)
    return Mesh(grid, (DATA_AXIS, PIPE_AXIS))


def has_pipe_axis(mesh: Optional[Mesh]) -> bool:
    return (mesh is not None and PIPE_AXIS in mesh.axis_names
            and int(mesh.shape[PIPE_AXIS]) > 1)


def pipeline_blocks(
    stacked_params: Any,
    tokens: jnp.ndarray,
    apply_block: Callable[[Any, jnp.ndarray], jnp.ndarray],
    *,
    mesh: Mesh,
    microbatches: int = 4,
) -> jnp.ndarray:
    """Run ``depth`` stacked transformer blocks as a GPipe pipeline.

    ``stacked_params``: pytree with leading dim ``depth`` (divisible by the
    mesh's ``pipe`` size). ``tokens``: (B, L, D) with B divisible by
    ``data_size * microbatches``. ``apply_block(p, x) -> x`` applies ONE
    block (already closed over static mode flags; no collectives inside).
    Returns (B, L, D), numerically identical to applying the blocks
    sequentially (same op order per token — verified by
    tests/model_tests/test_pp.py).
    """
    if not has_pipe_axis(mesh):
        raise ValueError("pipeline_blocks needs a mesh with a 'pipe' axis")
    n_stages = int(mesh.shape[PIPE_AXIS])
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    if depth % n_stages != 0:
        raise ValueError(f"depth {depth} not divisible by pp={n_stages}")
    per_stage = depth // n_stages
    m = int(microbatches)

    staged = jax.tree.map(
        lambda a: a.reshape((n_stages, per_stage) + a.shape[1:]),
        stacked_params)
    param_specs = jax.tree.map(lambda _: P(PIPE_AXIS), staged)
    data_in_mesh = DATA_AXIS in mesh.axis_names
    tok_spec = P(DATA_AXIS) if data_in_mesh else P()

    def run_stage(p_stage: Any, x: jnp.ndarray) -> jnp.ndarray:
        def body(carry, p):
            return apply_block(p, carry), None

        out, _ = jax.lax.scan(body, x, p_stage)
        return out

    def pipelined(staged_local: Any, tokens_local: jnp.ndarray) -> jnp.ndarray:
        # staged_local: (1, per_stage, ...) — this device's stage.
        # tokens_local: (B_local, L, D) — this data-shard's batch.
        p_stage = jax.tree.map(lambda a: a[0], staged_local)
        stage = jax.lax.axis_index(PIPE_AXIS)
        b_local = tokens_local.shape[0]
        if b_local % m != 0:
            raise ValueError(
                f"per-device batch {b_local} not divisible by "
                f"pp_microbatches={m}")
        mb = tokens_local.reshape((m, b_local // m) + tokens_local.shape[1:])

        def tick(carry, t):
            state, outbuf = carry
            # Stage 0 injects microbatch t (clamped: past-the-end ticks
            # feed garbage that drains before reaching the last stage).
            inp = jax.lax.dynamic_index_in_dim(
                mb, jnp.clip(t, 0, m - 1), 0, keepdims=False)
            state = jnp.where(stage == 0, inp, state)
            state = run_stage(p_stage, state)
            # The last stage finished microbatch j = t - (S-1) this tick.
            j = t - (n_stages - 1)
            record = (stage == n_stages - 1) & (j >= 0)
            updated = jax.lax.dynamic_update_index_in_dim(
                outbuf, state, jnp.clip(j, 0, m - 1), 0)
            outbuf = jnp.where(record, updated, outbuf)
            # Hand the activation to the next stage (ring permute; the
            # wrap-around last->first edge only ever carries drained
            # garbage, see the clamp above).
            state = jax.lax.ppermute(
                state, PIPE_AXIS,
                [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (state, outbuf), None

        state0 = jnp.zeros_like(mb[0])
        out0 = jnp.zeros_like(mb)
        (_, outbuf), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(m + n_stages - 1))
        # Replicate the collected outputs across stages (only the last
        # stage holds non-zeros; psum is its broadcast).
        outbuf = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outbuf, jnp.zeros_like(outbuf)),
            PIPE_AXIS)
        return outbuf.reshape((b_local,) + tokens_local.shape[1:])

    fn = jax.shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(param_specs, tok_spec),
        out_specs=tok_spec,
        check_vma=False,
    )
    return fn(staged, tokens)


def _is_blocks_path(path: Tuple) -> bool:
    return any(getattr(k, "key", str(k)) == "blocks" for k in path)


def pp_specs(params: Any) -> Any:
    """PartitionSpec pytree: stacked ``blocks`` leaves shard their leading
    (depth) dim over ``pipe``; everything else is replicated (patch embed,
    norms, and the decoder run on every stage — they are <10% of params)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: P(PIPE_AXIS) if _is_blocks_path(path) else P(),
        params)


def pp_place(params: Any, mesh: Mesh) -> Any:
    """Device-put params with the PP sharding rules."""
    specs = pp_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
