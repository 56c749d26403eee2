"""Jit-compiled, mesh-sharded training and evaluation loops.

Replaces the reference's Lightning modules (``instageo/model/base.py``,
``segmentation.py``, ``regression.py``) with a functional TPU design:

* one jitted ``train_step`` — forward (bf16 compute), masked loss, grads,
  AdamW update, weight clipping, BatchNorm stat update, and on-device metric
  accumulation — with donated state buffers;
* batch sharded over the ``data`` mesh axis, parameters replicated; XLA
  inserts the gradient all-reduce over ICI (no Lightning/NCCL analogue);
* streaming metrics stay on device all epoch (the reference syncs
  device→host every step — segmentation.py:143-151);
* distillation runs the frozen teacher inside the same jitted step.

Step semantics (losses, metric formulas, clipping, scheduler cadence) match
the reference within float tolerance; see tests/model_tests/test_trainer.py.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from instageo_tpu.parallel.mesh import (
    Mesh,
    make_mesh,
    pad_batch,
    replicate_tree,
    shard_batch,
    shard_stacked_batch,
    stacked_batch_sharding,
    zero1_place,
)
from instageo_tpu.train.losses import (
    kl_distillation_loss,
    masked_cross_entropy,
    masked_mse,
    mse_distillation_loss,
)
from instageo_tpu.train.metrics import AucHistogram, ConfusionMatrix, RegressionStats
from instageo_tpu.train.optim import clip_params, make_optimizer

log = logging.getLogger(__name__)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@flax.struct.dataclass
class EpochMetrics:
    """On-device accumulators for one epoch."""

    loss_sum: jnp.ndarray
    batches: jnp.ndarray
    cm: ConfusionMatrix
    auc: AucHistogram
    reg: RegressionStats

    @classmethod
    def empty(cls, num_classes: int) -> "EpochMetrics":
        return cls(
            loss_sum=jnp.zeros((), jnp.float32),
            batches=jnp.zeros((), jnp.float32),
            cm=ConfusionMatrix.empty(max(num_classes, 2)),
            auc=AucHistogram.empty(max(num_classes, 2)),
            reg=RegressionStats.empty(),
        )


class Trainer:
    """Training/eval orchestrator with orbax best-checkpointing.

    ``cfg`` is the Hydra-compatible ConfigDict (train.*, model.*, tpu.*).
    The model is a Flax module with ``__call__(x, train=...)`` returning
    (B, C, H, W) logits; ``variables`` holds params + batch_stats.
    """

    def __init__(
        self,
        cfg: Any,
        model: Any,
        variables: Dict,
        mesh: Optional[Mesh] = None,
        teacher: Optional[Tuple[Any, Dict]] = None,
        steps_per_epoch: int = 1,
    ) -> None:
        self.cfg = cfg
        self.model = model
        self.mesh = mesh or make_mesh()
        self.is_reg = bool(cfg.get("is_reg_task", False))
        self.num_classes = int(cfg.model.get("num_classes", 2))
        self.ignore_index = int(cfg.train.get("ignore_index", -100))
        cw = cfg.train.get("class_weights")
        self.class_weights = list(cw) if cw else None
        self.clip_range = cfg.model.get("weight_clip_range")
        self.use_log_scale = bool(cfg.model.get("use_log_scale", False))
        self.distillation = bool(cfg.train.get("distillation", False))
        self.teacher = teacher
        self.monitor_mode = "min" if self.is_reg else "max"
        self.best_metric = float("inf") if self.is_reg else -float("inf")
        tpu_cfg = self._tpu_cfg = cfg.get("tpu") or {}
        self._transfer_bf16 = str(tpu_cfg.get("precision", "bf16")) == "bf16" \
            and bool(tpu_cfg.get("bf16_transfer", True))
        spc = tpu_cfg.get("steps_per_call", 1)
        self._sample_bytes = (int(getattr(model, "in_chans", 6))
                              * int(cfg.dataloader.get("temporal_dim", 1))
                              * int(cfg.dataloader.get("img_size", 224)) ** 2
                              * (2 if self._transfer_bf16 else 4))
        self._auto_spc = str(spc) == "auto"
        if self._auto_spc:
            # Scan k steps per jitted call on TPU (283 -> 232 ms/step at
            # b=128 with k=8 — PERF.md round 3b: amortizes the fixed
            # per-dispatch cost). k is capped so the k staged input
            # batches stay under ~512 MB of HBM; off-TPU the scan only
            # adds compile time.
            if jax.default_backend() == "tpu":
                spc = self._k_cap(int(cfg.train.get("batch_size", 8)))
            else:
                spc = 1
        self.steps_per_call = max(1, int(spc))
        self.grad_accum = max(1, int(cfg.train.get("grad_accum", 1)))
        rng_impl = str(tpu_cfg.get("rng_impl", "auto"))
        if rng_impl not in ("auto", "rbg", "threefry"):
            raise ValueError(f"tpu.rng_impl={rng_impl!r} — expected "
                             "auto | rbg | threefry")
        if rng_impl == "auto":
            rng_impl = "rbg" if jax.default_backend() == "tpu" else "threefry"
        self._rng_impl = rng_impl

        self.tx = make_optimizer(
            variables["params"],
            learning_rate=float(cfg.train.get("learning_rate", 1e-4)),
            weight_decay=float(cfg.train.get("weight_decay", 1e-2)),
            scheduler=bool(cfg.train.get("scheduler", False)),
            steps_per_epoch=steps_per_epoch,
            freeze_backbone=bool(cfg.model.get("freeze_backbone", False)),
        )
        use_zero1 = (bool(tpu_cfg.get("zero1", False))
                     and int(self.mesh.devices.size) > 1)
        from instageo_tpu.parallel.pp import has_pipe_axis, pp_place
        from instageo_tpu.parallel.tp import has_model_axis, tp_place
        use_pp = has_pipe_axis(self.mesh)
        if int(self.mesh.devices.size) > 1:
            # The model clone carries the mesh so the attention body pins
            # its activations (batch on data; heads on model under TP) —
            # without it GSPMD invents head-dim shardings in the scanned
            # ZeRO-1 program and involuntarily rematerializes the softmax
            # (models/prithvi.py _tp_constrain). Under PP the same mesh
            # also drives the GPipe shard_map (models/prithvi.py
            # _apply_blocks_stacked; factory set block_layout=pipeline).
            clone_kw = {"tp_mesh": self.mesh}
            if use_pp:
                clone_kw["pp_mesh"] = self.mesh
            self.model = model = model.clone(**clone_kw)
        use_fsdp = (bool(tpu_cfg.get("fsdp", False))
                    and int(self.mesh.devices.size) > 1
                    and not has_model_axis(self.mesh)
                    and not use_pp)

        def place_params(p):
            """Student/teacher param placement per the configured mode."""
            if use_pp:
                return pp_place(p, self.mesh)
            if has_model_axis(self.mesh):
                return tp_place(p, self.mesh)
            if use_fsdp:
                from instageo_tpu.parallel.fsdp import fsdp_place

                return fsdp_place(p, self.mesh)
            return replicate_tree(p, self.mesh)

        # TP (tpu.tp>1): transformer matmuls sharded column/row over the
        # model axis (parallel/tp.py). FSDP (tpu.fsdp): params sharded
        # over the data axis; GSPMD all-gathers at use and — via the grad
        # pinning below — reduce-scatters the gradients. Optimizer moments
        # mirror the param shardings and are built LAZILY on the first
        # train step (_ensure_opt_state): eval-only consumers (mode=eval,
        # the serving engine) would otherwise pay ~2x params of HBM for
        # AdamW state they never read (600M: ~4.8 GB of a 16 GB chip).
        self._use_zero1 = use_zero1
        self._use_fsdp = use_fsdp
        self._use_pp = use_pp
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=place_params(variables["params"]),
            batch_stats=replicate_tree(variables.get("batch_stats", {}),
                                       self.mesh),
            opt_state=None,
        )
        if teacher is not None:
            # The frozen teacher forwards inside the SAME jitted step:
            # mirror the student's placement — under TP/FSDP a fully
            # replicated teacher would defeat the sharding that made the
            # config fit, and without tp_mesh its attention body lacks
            # the sharding pins the student needs (see clone above).
            t_model, t_vars = teacher
            if int(self.mesh.devices.size) > 1:
                t_model = t_model.clone(tp_mesh=self.mesh)
                self.teacher = teacher = (t_model, t_vars)
            self._teacher_vars = {
                **{k: replicate_tree(v, self.mesh)
                   for k, v in t_vars.items() if k != "params"},
                "params": place_params(t_vars.get("params", {})),
            }

        self._param_shardings = jax.tree.map(lambda a: a.sharding,
                                             self.state.params)
        self._train_step = self._build_train_step()
        self._train_scan = (self._build_train_scan()
                            if self.steps_per_call > 1 else None)
        self._eval_step = self._build_eval_step()
        self._eval_scan = (self._build_eval_scan()
                           if self.steps_per_call > 1 else None)

    def _ensure_opt_state(self) -> None:
        """Build + place the AdamW state on first TRAIN use (see __init__)."""
        if self.state.opt_state is not None:
            return
        # zeros_like on the sharded params inherits their shardings, which
        # is exactly the moment placement TP/FSDP want; ZeRO-1 then shards
        # the still-replicated moments over the data axis.
        opt_state = self.tx.init(self.state.params)
        if int(self.mesh.devices.size) > 1:
            from instageo_tpu.parallel.tp import (has_model_axis,
                                                  place_state_like_params)

            if self._use_pp:
                from instageo_tpu.parallel.pp import pp_specs

                opt_state = place_state_like_params(
                    opt_state, self.state.params, self.mesh,
                    zero1=self._use_zero1,
                    specs=pp_specs(self.state.params))
            elif has_model_axis(self.mesh):
                opt_state = place_state_like_params(
                    opt_state, self.state.params, self.mesh,
                    zero1=self._use_zero1)
            elif self._use_fsdp:
                from instageo_tpu.parallel.fsdp import fsdp_specs

                opt_state = place_state_like_params(
                    opt_state, self.state.params, self.mesh,
                    zero1=self._use_zero1,
                    specs=fsdp_specs(self.state.params, self.mesh))
            elif self._use_zero1:
                # ZeRO-1: shard optimizer moments over the data axis
                # (SURVEY.md §2.5).
                opt_state = zero1_place(opt_state, self.mesh)
            else:
                opt_state = replicate_tree(opt_state, self.mesh)
        self.state = self.state.replace(opt_state=opt_state)

    # -- step builders ----------------------------------------------------

    def _loss(self, logits: jnp.ndarray, labels: jnp.ndarray,
              teacher_logits: Optional[jnp.ndarray]) -> jnp.ndarray:
        if self.is_reg:
            preds = logits[:, 0]
            loss = masked_mse(preds, labels, float(self.ignore_index),
                              self.use_log_scale)
            if teacher_logits is not None:
                loss = loss + mse_distillation_loss(
                    preds, teacher_logits[:, 0], labels, float(self.ignore_index))
            return loss
        loss = masked_cross_entropy(logits, labels, self.ignore_index,
                                    self.class_weights)
        if teacher_logits is not None:
            loss = loss + kl_distillation_loss(
                logits, teacher_logits, labels, self.ignore_index)
        return loss

    def _update_metrics(self, metrics: EpochMetrics, logits, labels, loss,
                        with_auc: bool) -> EpochMetrics:
        if self.is_reg:
            preds = logits[:, 0].astype(jnp.float32)
            labels_f = labels.astype(jnp.float32)
            valid = labels_f != float(self.ignore_index)
            if self.use_log_scale:
                preds = jnp.expm1(preds)
            reg = metrics.reg.update(labels_f, preds, valid)
            return metrics.replace(
                loss_sum=metrics.loss_sum + loss, batches=metrics.batches + 1, reg=reg)
        preds = jnp.argmax(logits, axis=1)
        cm = metrics.cm.update(labels, preds, ignore_index=self.ignore_index)
        auc = metrics.auc
        if with_auc:
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
            probs_flat = probs.transpose(0, 2, 3, 1).reshape(-1, probs.shape[1])
            labels_flat = labels.reshape(-1)
            auc = auc.update(labels_flat, probs_flat,
                             valid=labels_flat != self.ignore_index)
        return metrics.replace(
            loss_sum=metrics.loss_sum + loss, batches=metrics.batches + 1,
            cm=cm, auc=auc)

    def _teacher_logits(self, x: jnp.ndarray) -> Optional[jnp.ndarray]:
        if not (self.distillation and self.teacher is not None):
            return None
        t_model, _ = self.teacher
        return jax.lax.stop_gradient(
            t_model.apply(self._teacher_vars, x, train=False))

    def _micro_grads(self, params, batch_stats, x, labels, rng):
        """Loss/grads for one (micro-)batch; returns mutated batch_stats."""
        teacher_logits = self._teacher_logits(x)

        def loss_fn(params):
            out, mutated = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            return self._loss(out, labels, teacher_logits), (out, mutated)

        (loss, (logits, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return loss, logits, mutated["batch_stats"], grads

    def _accum_grads(self, state: TrainState, x, labels, rng,
                     metrics: EpochMetrics):
        """Gradient accumulation (``train.grad_accum`` = a > 1): the batch
        splits into ``a`` sequential micro-batches inside the SAME jitted
        step — one forward+backward each under a ``lax.scan`` (so only one
        micro-batch of activations is live at a time; an alternative to
        ``tpu.remat``'s ~24% recompute tax for HBM-bound configs), grads
        combined, ONE optimizer update. BatchNorm statistics update per
        micro-batch (the running-average semantics every framework has
        under accumulation); metrics see every micro-batch.

        Micro gradients are weighted by each micro-batch's VALID-pixel
        count, not an equal 1/a: every loss this trainer builds
        normalizes by the valid count (train/losses.py), so this
        reproduces the full-batch gradient exactly even when ignore-
        labeled padding concentrates in the tail micro-batches (a plain
        average would silently scale gradients down by the padded
        fraction). Reported losses get the same weighting.
        """
        a = self.grad_accum
        b = x.shape[0]
        xs = x.reshape(a, b // a, *x.shape[1:])
        ys = labels.reshape(a, b // a, *labels.shape[1:])
        if self.mesh.devices.size > 1:
            spec = stacked_batch_sharding(self.mesh)
            xs = jax.lax.with_sharding_constraint(xs, spec)
            ys = jax.lax.with_sharding_constraint(ys, spec)
        rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(a))
        ign = float(self.ignore_index) if self.is_reg else self.ignore_index
        w = (ys != ign).reshape(a, -1).sum(axis=1).astype(jnp.float32)
        w_total = jnp.maximum(w.sum(), 1.0)

        def micro(carry, inp):
            bs, gsum, m = carry
            xb, yb, r, wi = inp
            loss, logits, bs, grads = self._micro_grads(
                state.params, bs, xb, yb, r)
            # Each micro counts as one metrics batch; scaling its loss by
            # wi·a/Σw keeps the epoch mean the valid-pixel-weighted mean.
            m = self._update_metrics(m, logits, yb,
                                     loss * wi * a / w_total, with_auc=False)
            gsum = jax.tree.map(lambda s, g: s + wi * g, gsum, grads)
            return (bs, gsum, m), None

        gzero = jax.tree.map(jnp.zeros_like, state.params)
        (batch_stats, gsum, metrics), _ = jax.lax.scan(
            micro, (state.batch_stats, gzero, metrics), (xs, ys, rngs, w))
        grads = jax.tree.map(lambda g: g / w_total, gsum)
        return grads, {"batch_stats": batch_stats}, metrics

    def _train_step_body(self, state: TrainState, x, labels, rng,
                         metrics: EpochMetrics):
        """One optimizer step (traced inside both jit variants)."""
        if self.grad_accum > 1:
            grads, mutated, metrics = self._accum_grads(
                state, x, labels, rng, metrics)
        else:
            loss, logits, new_bs, grads = self._micro_grads(
                state.params, state.batch_stats, x, labels, rng)
            mutated = {"batch_stats": new_bs}
            metrics = self._update_metrics(metrics, logits, labels, loss,
                                           with_auc=False)
        if self.mesh.devices.size > 1:
            # Pin gradients to the params' shardings (replicated under DP,
            # column/row under TP). Without this, ZeRO-1's dim0-sharded
            # optimizer moments back-propagate through the kernel-grad
            # einsums and GSPMD infects the attention cotangents with
            # head/feature shardings it can only reconcile by involuntary
            # full rematerialization (round-2 dryrun log). The moment
            # resharding then happens where it belongs: inside the cheap
            # optimizer elementwise update.
            grads = jax.lax.with_sharding_constraint(
                grads, self._param_shardings)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = clip_params(params, self.clip_range)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=mutated["batch_stats"],
            opt_state=opt_state,
        )
        return new_state, metrics

    def _lazy_opt_wrapper(self, jitted: Callable) -> Callable:
        """Materialize the lazily-built optimizer state before a train
        call (callers may pass a state captured while opt_state was still
        None — swap in the built one)."""

        def _materialize(state: TrainState) -> TrainState:
            if state.opt_state is None:
                self._ensure_opt_state()
                state = state.replace(opt_state=self.state.opt_state)
            return state

        def call(state: TrainState, *args):
            return jitted(_materialize(state), *args)

        # Keep jax.jit's lowering API usable through the wrapper (bench.py
        # and telemetry lower the step for XLA cost-analysis FLOPs).
        call.lower = lambda state, *args: jitted.lower(_materialize(state),
                                                       *args)
        return call

    def _build_train_step(self) -> Callable:
        donate = bool(self._tpu_cfg.get("donate_state", True))
        return self._lazy_opt_wrapper(
            jax.jit(self._train_step_body,
                    donate_argnums=(0,) if donate else ()))

    def _build_train_scan(self) -> Callable:
        """``steps_per_call`` optimizer steps chained in ONE jitted call.

        A ``lax.scan`` over pre-staged batches executes as a single XLA
        program, paying the per-dispatch overhead (host dispatch; on a
        relay-attached TPU a ~27 ms execution round-trip — PERF.md) once
        per k steps instead of per step. Numerics are identical to k
        single-step calls: same per-step RNG folding, same optimizer and
        metric updates.
        """
        donate = bool(self._tpu_cfg.get("donate_state", True))

        def multi(state: TrainState, xs, ys, rngs, metrics: EpochMetrics):
            def body(carry, batch):
                st, m = carry
                x, y, rng = batch
                st, m = self._train_step_body(st, x, y, rng, m)
                return (st, m), None

            (state, metrics), _ = jax.lax.scan(
                body, (state, metrics), (xs, ys, rngs))
            return state, metrics

        return self._lazy_opt_wrapper(
            jax.jit(multi, donate_argnums=(0,) if donate else ()))

    def _eval_step_body(self, state: TrainState, x, labels,
                        metrics: EpochMetrics, with_auc: bool,
                        return_logits: bool):
        logits = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)
        loss = self._loss(logits, labels, None)
        new_metrics = self._update_metrics(metrics, logits, labels, loss,
                                           with_auc)
        # Returning logits from the same jitted step keeps plot
        # collection at ONE forward per eval batch.
        return new_metrics, (logits if return_logits else loss)

    def _build_eval_step(self) -> Callable:
        return jax.jit(self._eval_step_body,
                       static_argnames=("with_auc", "return_logits"))

    def _build_eval_scan(self) -> Callable:
        """k metrics-only eval steps in one jitted call (see
        ``_build_train_scan`` — same per-dispatch amortization; test
        epochs over sliding-window crops are many small batches)."""

        def multi(state: TrainState, xs, ys, metrics: EpochMetrics,
                  with_auc: bool):
            def body(m, batch):
                x, y = batch
                m, _ = self._eval_step_body(state, x, y, m, with_auc, False)
                return m, None

            metrics, _ = jax.lax.scan(body, metrics, (xs, ys))
            return metrics

        return jax.jit(multi, static_argnames=("with_auc",))

    # -- epoch loops -------------------------------------------------------

    def _k_cap(self, batch_size: int) -> int:
        """Largest k<=8 whose staged (k, B, ...) input stack stays under
        ~512 MB of HBM."""
        batch_bytes = batch_size * self._sample_bytes
        return max(1, min(8, (512 << 20) // max(batch_bytes, 1)))

    def _k_for(self, batch_size: int) -> int:
        """Scan length actually used this epoch. Under ``steps_per_call:
        auto`` the config-time sizing used ``train.batch_size``; eval/test
        callers can pass a much larger batch, so re-clamp to the HBM cap
        for the batch size in effect (an explicit integer k is honored
        as configured)."""
        k = self.steps_per_call
        if k > 1 and self._auto_spc:
            k = min(k, self._k_cap(batch_size))
        return k

    def _shard(self, x: np.ndarray, y: np.ndarray):
        out = shard_batch((x, y), self.mesh)
        return out[0], out[1]

    def _prepare_host(self, x, y, batch_size, accum: Optional[int] = None):
        """Pad + cast on the host (no device placement).

        ``accum``: micro-batch count the padded batch must divide into —
        the TRAIN paths pass ``self.grad_accum``; eval paths pass 1
        (accumulation only exists in the train step, and padding eval
        batches to the accumulation unit would waste FLOPs/transfer).
        """
        fill = self.ignore_index if not self.is_reg else float(self.ignore_index)
        # Static shapes for jit + divisibility for the data-parallel mesh:
        # pad up to the next multiple of the mesh size >= batch_size
        # (and, under grad accumulation, each micro-batch must divide
        # the mesh too: a multiple of grad_accum * mesh size).
        accum = self.grad_accum if accum is None else max(1, int(accum))
        unit = int(self.mesh.devices.size) * accum
        target = max(batch_size, int(np.asarray(x).shape[0]))
        target = ((target + unit - 1) // unit) * unit
        x, y, _ = pad_batch((np.asarray(x), np.asarray(y)), target, fill,
                            repeat_inputs=True)
        if self._transfer_bf16:
            # Model computes in bf16 anyway; casting on the host halves the
            # host->device bytes of the (normalized f32) batch.
            import ml_dtypes

            x = x.astype(ml_dtypes.bfloat16)
        return x, y

    def _prepare(self, x, y, batch_size, accum: Optional[int] = None):
        x, y = self._prepare_host(x, y, batch_size, accum)
        return self._shard(x, y)

    def _epoch_rng(self, rng: jax.Array) -> jax.Array:
        """Re-key the epoch's dropout stream onto the configured PRNG.

        ``rbg`` lowers to the TPU's native RngBitGenerator instead of
        software threefry: mask generation for the decoder's five
        full-resolution dropouts dominates its training cost under
        threefry (decoder fwd+bwd 108.9 -> 85.2 ms at b=64 — PERF.md,
        bench_decoder.py). Deterministic per seed, like any PRNG choice;
        the stream simply differs between impls (dropout masks never
        matched torch bit-for-bit anyway).
        """
        if self._rng_impl == "threefry":
            return rng
        # Carry BOTH 32-bit words of the threefry key into the new stream —
        # keeping only the low word would collapse (seed, epoch) pairs onto
        # a 2^32 space. The high word goes in via fold_in (jax.random.key
        # truncates >32-bit seeds when x64 is off).
        words = np.asarray(jax.random.key_data(rng)).ravel()
        key = jax.random.key(int(words[-1]), impl=self._rng_impl)
        if words.size >= 2:
            key = jax.random.fold_in(key, int(words[-2]))
        return key

    def _reject_quant_training(self) -> None:
        """tpu.quant is a serving knob: jnp.round has a zero gradient, so
        a quantized TRAINING graph would silently train nothing. Guarded
        here (not in __init__) because mode=eval and ModelServer.evaluate
        build a Trainer too — eval/infer of a quantized model is the
        knob's whole point (ops/quant.py)."""
        if str(self._tpu_cfg.get("quant", "none")) != "none":
            raise ValueError(
                "tpu.quant is inference-only (ops/quant.py) — unset it "
                "for mode=train")

    def run_train_epoch(self, batches: Iterable, rng: jax.Array,
                        batch_size: int) -> Dict:
        self._reject_quant_training()
        self._ensure_opt_state()
        rng = self._epoch_rng(rng)
        metrics = EpochMetrics.empty(self.num_classes)
        k = self._k_for(batch_size)
        if self._train_scan is None or k == 1:
            for i, (x, y) in enumerate(batches):
                x, y = self._prepare(x, y, batch_size)
                step_rng = jax.random.fold_in(rng, i)
                self.state, metrics = self._train_step(self.state, x, y,
                                                       step_rng, metrics)
            return self._finalize(metrics, "train", with_auc=False)

        # Multi-step path: group k prepared batches, run one scanned call.
        group, i = [], 0

        def flush(group, i0, metrics):
            if len(group) == k:
                xs = np.stack([g[0] for g in group])
                ys = np.stack([g[1] for g in group])
                xs, ys = shard_stacked_batch((xs, ys), self.mesh)
                rngs = jnp.stack([jax.random.fold_in(rng, i0 + j)
                                  for j in range(k)])
                self.state, metrics = self._train_scan(self.state, xs, ys,
                                                       rngs, metrics)
            else:  # tail group: identical math via single-step calls
                for j, (x, y) in enumerate(group):
                    x, y = self._shard(x, y)
                    step_rng = jax.random.fold_in(rng, i0 + j)
                    self.state, metrics = self._train_step(
                        self.state, x, y, step_rng, metrics)
            return metrics

        for x, y in batches:
            group.append(self._prepare_host(x, y, batch_size))
            if len(group) == k:
                metrics = flush(group, i, metrics)
                i += k
                group = []
        if group:
            metrics = flush(group, i, metrics)
        return self._finalize(metrics, "train", with_auc=False)

    def run_eval_epoch(self, batches: Iterable, batch_size: int,
                       step_type: str = "val",
                       collect_outputs: bool = False) -> Dict:
        metrics = EpochMetrics.empty(self.num_classes)
        with_auc = step_type == "test" and not self.is_reg
        if (self._eval_scan is not None and not collect_outputs
                and self._k_for(batch_size) > 1):
            return self._run_eval_epoch_scanned(batches, batch_size,
                                                step_type, with_auc, metrics)
        collected_p, collected_y = [], []
        for x, y in batches:
            n_real = np.asarray(x).shape[0]
            x, y = self._prepare(x, y, batch_size, accum=1)
            collect = collect_outputs and self.is_reg
            metrics, logits = self._eval_step(self.state, x, y, metrics,
                                              with_auc, collect)
            if collect:
                # host copy of valid-regression predictions (for plots)
                preds = np.asarray(jax.device_get(logits))[:n_real, 0]
                if self.use_log_scale:
                    preds = np.expm1(preds)
                labels = np.asarray(jax.device_get(y))[:n_real]
                valid = labels != float(self.ignore_index)
                collected_p.append(preds[valid])
                collected_y.append(labels[valid])
        out = self._finalize(metrics, step_type, with_auc=with_auc)
        if collect_outputs and collected_p:
            out["_preds"] = np.concatenate(collected_p)
            out["_labels"] = np.concatenate(collected_y)
        return out

    def _run_eval_epoch_scanned(self, batches, batch_size, step_type,
                                with_auc, metrics) -> Dict:
        k = self._k_for(batch_size)
        group = []

        def flush(group, metrics):
            if len(group) == k:
                xs = np.stack([g[0] for g in group])
                ys = np.stack([g[1] for g in group])
                xs, ys = shard_stacked_batch((xs, ys), self.mesh)
                return self._eval_scan(self.state, xs, ys, metrics,
                                       with_auc=with_auc)
            for x, y in group:
                x, y = self._shard(x, y)
                metrics, _ = self._eval_step(self.state, x, y, metrics,
                                             with_auc, False)
            return metrics

        for x, y in batches:
            group.append(self._prepare_host(x, y, batch_size, accum=1))
            if len(group) == k:
                metrics = flush(group, metrics)
                group = []
        if group:
            metrics = flush(group, metrics)
        return self._finalize(metrics, step_type, with_auc=with_auc)

    def _finalize(self, metrics: EpochMetrics, step_type: str,
                  with_auc: bool) -> Dict:
        """One host transfer per epoch; log names match the reference."""
        out: Dict = {}
        n = float(jax.device_get(metrics.batches)) or 1.0
        out[f"{step_type}_loss"] = float(jax.device_get(metrics.loss_sum)) / n
        if self.is_reg:
            m = metrics.reg.compute(
                include_ee=bool(self.cfg.model.get("include_ee_metric", False)))
            out.update({
                f"{step_type}_RMSE": m["rmse"],
                f"{step_type}_MAE": m["mae"],
                f"{step_type}_R2": m["r2_score"],
                f"{step_type}_Pearson": m["pearson_corrcoef"],
            })
            if m["ee_percentage"] is not None:
                out[f"{step_type}_EE_Percentage"] = m["ee_percentage"]
        else:
            m = metrics.cm.compute()
            out.update({
                f"{step_type}_Acc": m["accuracy"],
                f"{step_type}_IoU": m["jaccard"],
                f"{step_type}_F1": m["f1"],
                f"{step_type}_Precision": m["precision"],
                f"{step_type}_Recall": m["recall"],
            })
            for idx, v in enumerate(m["jaccard_per_class"][: self.num_classes]):
                out[f"{step_type}_IoU_{idx}"] = v
            for idx, v in enumerate(m["f1_per_class"][: self.num_classes]):
                out[f"{step_type}_F1_{idx}"] = v
            if with_auc:
                out[f"{step_type}_roc_auc"] = metrics.auc.score()["roc_auc_macro"]
        return out

    # -- fit ----------------------------------------------------------------

    def fit(self, train_loader, val_loader, checkpointer=None,
            seed: int = 1042, log_fn: Optional[Callable] = None) -> Dict:
        """Full training run; returns the last epoch's metric dict."""
        self._reject_quant_training()
        num_epochs = int(self.cfg.train.get("num_epochs", 1))
        batch_size = int(self.cfg.train.get("batch_size", 8))
        monitor = "val_RMSE" if self.is_reg else "val_IoU"
        rng = jax.random.PRNGKey(seed)
        history: Dict = {}
        for epoch in range(num_epochs):
            t0 = time.time()
            epoch_rng = jax.random.fold_in(rng, epoch)
            train_m = self.run_train_epoch(train_loader(), epoch_rng, batch_size)
            val_m = self.run_eval_epoch(val_loader(), batch_size, "val")
            history = {**train_m, **val_m, "epoch": epoch,
                       "epoch_time_s": time.time() - t0}
            if log_fn:
                log_fn(history)
            log.info("epoch %d: %s", epoch, {k: round(v, 4) if isinstance(v, float)
                                             else v for k, v in history.items()})
            score = val_m.get(monitor)
            improved = (
                score is not None
                and not np.isnan(score)
                and ((score > self.best_metric) if self.monitor_mode == "max"
                     else (score < self.best_metric))
            )
            if improved:
                self.best_metric = score
                if checkpointer is not None:
                    checkpointer.save(self.state, metrics=history)
        return history

    def test(self, test_loader, batch_size: Optional[int] = None) -> Dict:
        batch_size = batch_size or int(self.cfg.train.get("batch_size", 8))
        return self.run_eval_epoch(test_loader(), batch_size, "test")

    def restore(self, ckpt_path: str) -> None:
        """Resume training state (step/params/batch_stats/opt_state) from an
        orbax checkpoint written by :class:`BestCheckpointer`.

        Also restores ``best_metric`` from the checkpoint's sidecar
        metrics JSON when present — otherwise the first (typically worse)
        post-resume epoch would immediately overwrite the previously-best
        checkpoint."""
        import json as _json

        import orbax.checkpoint as ocp

        self._ensure_opt_state()
        target = {
            "step": jax.device_get(self.state.step),
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
        }
        from instageo_tpu.train.checkpointing import migrate_param_tree

        ckptr = ocp.StandardCheckpointer()
        path = os.path.abspath(ckpt_path)
        try:
            restored = ckptr.restore(path, target=target)
            opt_state = restored["opt_state"]
        except Exception:
            # Older checkpoints without opt_state: restore the rest and
            # keep the freshly initialized optimizer state.
            tgt = {k: v for k, v in target.items() if k != "opt_state"}
            restored = ckptr.restore(path, target=tgt)
            opt_state = jax.device_get(self.state.opt_state)
        # Legacy param layouts (e.g. the pre-round-3 flat qkv): orbax
        # restores SAVED shapes even under a target, silently — reshape
        # same-size leaves onto the live layout (pure reshape, same
        # memory order). Optimizer moments mirror the params, so the
        # same migration applies.
        restored["params"] = migrate_param_tree(restored["params"],
                                                target["params"])
        restored["batch_stats"] = migrate_param_tree(
            restored.get("batch_stats", {}), target["batch_stats"])
        opt_state = migrate_param_tree(opt_state, target["opt_state"])
        def place_like(new_tree, cur_tree):
            # Re-place each restored leaf with the LIVE state's sharding —
            # replicate_tree here would silently discard the ZeRO-1 /
            # tensor-parallel placements the trainer was built with
            # (blowing up per-chip HBM by the sharding factor and forcing
            # a recompile against the wrong layouts).
            return jax.tree.map(
                lambda new, cur: jax.device_put(new, cur.sharding)
                if hasattr(cur, "sharding") else jax.device_put(new),
                new_tree, cur_tree)

        self.state = TrainState(
            step=jnp.asarray(restored["step"]),
            params=place_like(restored["params"], self.state.params),
            batch_stats=place_like(restored["batch_stats"],
                                   self.state.batch_stats),
            opt_state=place_like(opt_state, self.state.opt_state),
        )
        metrics_path = path + ".metrics.json"
        monitor = "val_RMSE" if self.is_reg else "val_IoU"
        if os.path.exists(metrics_path):
            try:
                with open(metrics_path) as f:
                    saved = _json.load(f)
                if monitor in saved:
                    self.best_metric = float(saved[monitor])
            except Exception as e:
                log.warning("could not restore best_metric from %s: %s",
                            metrics_path, e)
