"""Model factory: config → model + initial variables (+ checkpoint load).

Mirrors the reference ``create_model`` surface (``instageo/model/factory.py``):
resolves the task (segmentation vs regression vs distillation) from the
config, builds the Flax model, initializes or loads weights. Pretrained
Prithvi encoders load from a local torch ``.pt``/``.npz`` via the converter
(the reference downloads from HF hub — model.py:229-248; pass
``model.pretrained_path`` here, or leave unset for fresh init).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from instageo_tpu.models.checkpoint import (
    load_pretrained_encoder,
    seg_variables_from_torch,
)
from instageo_tpu.models.registry import get_arch
from instageo_tpu.models.seg import PrithviSeg
from instageo_tpu.train.checkpointing import load_checkpoint

log = logging.getLogger(__name__)


def _dtype_from_cfg(cfg: Any) -> jnp.dtype:
    prec = (cfg.get("tpu") or {}).get("precision", "bf16")
    return jnp.bfloat16 if str(prec) == "bf16" else jnp.float32


def model_channels(cfg: Any) -> int:
    """Per-frame model input channels implied by the dataloader config.

    Chip FILES stack frames channelwise ((T·C, H, W) — data/stac.py),
    and ``dataloader.bands`` indexes that stacked axis: the shipped
    multi-temporal configs list T·C entries (e.g. 18 for the T=3 crop
    task) while the dataloader reshapes every chip to C = len(bands)/T
    channels per frame (dataloader.py normalize_and_reshape). The
    reference sidesteps this by hardcoding 6 model channels regardless
    of the band list (model.py:301 ``model_bands`` default); here the
    per-frame count is derived: when bands spans exactly T frames of
    ``len(mean)`` channels it is ``len(mean)``, otherwise bands IS the
    per-frame list (in-memory datasets pass (B, C, T, H, W) directly
    with ``bands=range(C)``, e.g. benchmarks/convergence_parity_tasks).
    The derivation is ambiguous when an in-memory per-frame band list
    happens to satisfy ``len(bands) == temporal_dim * len(mean)`` —
    set ``model.num_channels`` explicitly to override it.
    """
    explicit = (cfg.get("model") or {}).get("num_channels")
    if explicit:
        return int(explicit)
    dl = cfg.dataloader
    bands = dl.get("bands")
    mean = dl.get("mean")
    c = len(list(bands)) if bands else len(list(mean or [0] * 6))
    t = int(dl.get("temporal_dim", 1))
    if t > 1 and mean and c == t * len(list(mean)):
        return len(list(mean))
    return c


def build_model(cfg: Any) -> PrithviSeg:
    """Construct the PrithviSeg module from a run config."""
    num_bands = model_channels(cfg)
    num_classes = 1 if cfg.get("is_reg_task", False) else int(cfg.model.num_classes)
    tpu_cfg = cfg.get("tpu") or {}
    # Validate enum-like knobs up front: Mlp's gelu dispatch (and the
    # dropout path selection) else-branch to the default form, so a typo
    # like gelu=tahn would silently run "exact" forever.
    for knob, allowed in (("gelu", ("exact", "tanh", "bf16")),
                          ("attn_impl", ("xla", "pallas", "auto")),
                          ("dropout_impl", ("xla", "bits16", "bits8",
                                            "pallas")),
                          ("quant", ("none", "int8")),
                          ("block_layout", ("loop", "scan", "pipeline"))):
        val = str(tpu_cfg.get(knob, allowed[0]))
        if val not in allowed:
            raise ValueError(
                f"tpu.{knob}={val!r} — expected one of {allowed}")
    head_impl = str(cfg.model.get("head_impl", "torch"))
    if head_impl not in ("torch", "fast"):
        raise ValueError(
            f"model.head_impl={head_impl!r} — expected torch | fast")
    # tpu.pp>1 needs the stacked layout; the mesh itself is attached by the
    # Trainer (clone(pp_mesh=...)) — init stays meshless via the scan
    # degradation (models/prithvi.py).
    block_layout = str(tpu_cfg.get("block_layout", "loop"))
    if int(tpu_cfg.get("pp", 1)) > 1:
        if block_layout == "loop":
            block_layout = "pipeline"
        if int(tpu_cfg.get("tp", 1)) > 1:
            raise ValueError("tpu.pp and tpu.tp are mutually exclusive "
                             "(parallel/pp.py module docstring)")
    use_sp = bool(tpu_cfg.get("sp", False))
    if use_sp and int(tpu_cfg.get("tp", 1)) <= 1:
        raise ValueError("tpu.sp (sequence parallelism) shards tokens over "
                         "the model axis — it requires tpu.tp > 1")
    return PrithviSeg(
        variant=str(cfg.model.model_name),
        num_classes=num_classes,
        temporal_step=int(cfg.dataloader.get("temporal_dim", 1)),
        image_size=int(cfg.dataloader.get("img_size", 224)),
        in_chans=num_bands,
        depth=int(cfg.model.get("depth", -1)),
        dtype=_dtype_from_cfg(cfg),
        attn_impl=str((cfg.get("tpu") or {}).get("attn_impl", "xla")),
        # Test-only: interpret-mode pallas so the pallas branch runs on
        # the CPU mesh (models/prithvi.py Attention.attn_interpret).
        attn_interpret=bool(tpu_cfg.get("attn_interpret", False)),
        remat=bool((cfg.get("tpu") or {}).get("remat", False)),
        gelu=str((cfg.get("tpu") or {}).get("gelu", "exact")),
        quant=str(tpu_cfg.get("quant", "none")),
        dropout_impl=str((cfg.get("tpu") or {}).get("dropout_impl", "xla")),
        head_impl=head_impl,
        block_layout=block_layout,
        pp_microbatches=int(tpu_cfg.get("pp_microbatches", 4)),
        sp=use_sp,
    )


def init_variables(model: PrithviSeg, cfg: Any, seed: int = 0) -> Dict:
    """Initialize model variables (abstract-eval friendly shapes)."""
    t = int(cfg.dataloader.get("temporal_dim", 1))
    s = int(cfg.dataloader.get("img_size", 224))
    c = int(model.in_chans)  # per-frame channels (model_channels())
    x = jnp.zeros((1, c, t, s, s), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x)


def create_model(cfg: Any, seed: int = 0) -> Tuple[PrithviSeg, Dict]:
    """Build model + variables per config; load checkpoints when configured.

    Load order (reference factory.py:96-116 semantics):
    1. ``cfg.checkpoint_path`` set (eval/inference): load the fine-tuned
       checkpoint — orbax dir, or a torch Lightning ``.ckpt``;
    2. else if ``cfg.model.load_pretrained_weights`` and a local pretrained
       file is available: initialize the encoder from it (band surgery);
    3. else fresh init.
    """
    model = build_model(cfg)
    variables = init_variables(model, cfg, seed)

    ckpt_path = cfg.get("checkpoint_path")
    if ckpt_path:
        variables = load_finetuned(ckpt_path, model, cfg, variables)
        return model, _match_block_layout(variables, model)

    if cfg.model.get("load_pretrained_weights", False):
        pre_path = cfg.model.get("pretrained_path") or os.environ.get(
            "PRITHVI_PRETRAINED_PATH"
        )
        if pre_path and os.path.exists(pre_path):
            arch = get_arch(
                str(cfg.model.model_name),
                in_chans=model_channels(cfg),
                num_frames=int(cfg.dataloader.get("temporal_dim", 1)),
                img_size=int(cfg.dataloader.get("img_size", 224)),
                depth=int(cfg.model.get("depth", -1)),
            )
            # Band surgery (reference model.py:330): the model's channel
            # list is the pretrained HLS band names tiled to in_chans —
            # multiples of 6 copy the pretrained embed weights per cycle;
            # without this, a non-6-channel model would get a 6-channel
            # patch-embed kernel and fail at the first forward.
            from instageo_tpu.models.checkpoint import PRETRAINED_BANDS

            n_bands = model_channels(cfg)
            reps = -(-n_bands // len(PRETRAINED_BANDS))
            model_bands = (list(PRETRAINED_BANDS) * reps)[:n_bands]
            enc = load_pretrained_encoder(pre_path, arch,
                                          model_bands=model_bands)
            params = dict(variables["params"])
            params["prithvi_encoder"] = enc
            variables = _match_block_layout(
                {**variables, "params": params}, model)
            log.info("Loaded pretrained encoder from %s", pre_path)
        else:
            log.warning(
                "load_pretrained_weights=True but no local pretrained file "
                "(set model.pretrained_path or PRITHVI_PRETRAINED_PATH); "
                "using fresh init."
            )
    return model, variables


def _match_block_layout(variables: Dict, model: PrithviSeg) -> Dict:
    """Convert loaded encoder params onto the model's block layout.

    Torch conversion and pre-layout-change orbax checkpoints carry the
    loop layout (blocks_0..N); scan/pipeline models need them stacked
    (models/prithvi.py stack_block_params) — and vice versa for exporting
    a stacked run back through a loop-layout consumer.
    """
    from instageo_tpu.models.prithvi import (stack_block_params,
                                             unstack_block_params)

    params = variables.get("params", {})
    enc = params.get("prithvi_encoder")
    if not isinstance(enc, dict):
        return variables
    if model.block_layout != "loop" and "blocks_0" in enc:
        depth = sum(1 for k in enc if k.startswith("blocks_"))
        enc = stack_block_params(enc, depth)
    elif model.block_layout == "loop" and "blocks" in enc:
        enc = unstack_block_params(enc)
    else:
        return variables
    return {**variables, "params": {**params, "prithvi_encoder": enc}}


def load_finetuned(path: str, model: PrithviSeg, cfg: Any,
                   init_vars: Optional[Dict] = None) -> Dict:
    """Load a fine-tuned checkpoint: orbax dir or torch Lightning file."""
    if os.path.isdir(path):
        # Restore without a target (checkpoints may or may not carry
        # opt_state for mid-training resume); arrays come back as numpy.
        restored = load_checkpoint(path, target=None)
        params = restored["params"]
        if init_vars is not None:
            # Checkpoints from before a param-layout change (e.g. the
            # round-3 flat->head-structured qkv) carry the old shapes;
            # reshape them onto the live layout (same memory order).
            from instageo_tpu.train.checkpointing import migrate_param_tree

            params = migrate_param_tree(params, init_vars["params"])
        return {"params": params,
                "batch_stats": restored.get("batch_stats", {})}
    # torch Lightning checkpoint (.ckpt/.pt)
    from instageo_tpu.models.checkpoint import load_torch_file

    sd = load_torch_file(path)
    arch = get_arch(
        str(cfg.model.model_name),
        in_chans=model_channels(cfg),
        num_frames=int(cfg.dataloader.get("temporal_dim", 1)),
        img_size=int(cfg.dataloader.get("img_size", 224)),
        depth=int(cfg.model.get("depth", -1)),
    )
    return seg_variables_from_torch(sd, arch)
