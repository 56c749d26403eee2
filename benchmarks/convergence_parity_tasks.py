"""Convergence parity for the remaining training paths (VERDICT r2 #3).

Extends benchmarks/convergence_parity.py (tiny binary seg) to the other
three training configurations the reference demonstrates quality on:

  crop        13-class, T=3, computed (inverse-frequency) class weights —
              the multitemporal_crop_classification.yaml shape
              (reference README.md:34-41, segmentation.py:84-122)
  regression  masked MSE with log1p label scaling
              (reference regression.py:34-61, 140-160, 343-565)
  distill     segmentation distillation: CE + KLDiv vs a fixed teacher
              (reference segmentation.py:351-391)

Protocol identical to convergence_parity.py: same initial weights
(exported through the layout converter), same batch order, same
AdamW(lr, wd=1e-2); parity judged at the held-out metric level.

Run:  python benchmarks/convergence_parity_tasks.py --task crop [--steps N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests",
                                "model_tests"))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from convergence_parity import (
    miou_from_preds,
    post_warmup_envelope,
    seg_forward_train,
)

NUM_CROP_CLASSES = 13


# ---------------------------------------------------------------------------
# Synthetic tasks
# ---------------------------------------------------------------------------


def _smooth_field(rng, n, size):
    gy, gx = np.mgrid[0:size, 0:size] / size
    f = (np.sin(2 * np.pi * (gy[None] * rng.uniform(0.5, 1.5, (n, 1, 1))
                             + rng.uniform(0, 1, (n, 1, 1))))
         + np.cos(2 * np.pi * (gx[None] * rng.uniform(0.5, 1.5, (n, 1, 1))
                               + rng.uniform(0, 1, (n, 1, 1)))))
    return (f - f.min()) / (f.max() - f.min() + 1e-9)  # [0, 1]


def make_crop_dataset(n, size=32, bands=6, t=3, seed=0):
    """13-class crop-like task, T=3, IMBALANCED classes (z² warp) so the
    computed inverse-frequency class weights actually matter."""
    rng = np.random.default_rng(seed)
    z = _smooth_field(rng, n, size) ** 2  # imbalanced toward low classes
    y = np.minimum((z * NUM_CROP_CLASSES).astype(np.int32),
                   NUM_CROP_CLASSES - 1)
    x = rng.normal(scale=0.4, size=(n, bands, t, size, size)).astype(np.float32)
    # Signal: the latent is observable in two bands with per-frame gain —
    # a temporal model can sharpen the class boundaries.
    for ti in range(t):
        x[:, 0, ti] += z * (2.0 + 0.5 * ti)
        x[:, 3, ti] -= z * 1.5
    y[:, :1, :] = -1  # ignore band, as in the seg task
    return x, y


def make_reg_dataset(n, size=32, bands=6, seed=0):
    """Regression: y = expm1(4·z) ≥ 0 (log1p-friendly dynamic range)."""
    rng = np.random.default_rng(seed)
    z = _smooth_field(rng, n, size)
    y = np.expm1(4.0 * z).astype(np.float32)
    x = rng.normal(scale=0.3, size=(n, bands, 1, size, size)).astype(np.float32)
    x[:, 0, 0] += z * 3.0
    x[:, 2, 0] += z * z * 2.0
    y[:, :1, :] = -1.0  # ignore pixels
    return x, y


def compute_class_weights(y, num_classes):
    """Inverse-frequency weights normalized to mean 1 (the reference's
    chip_creator-computed class-weight convention)."""
    counts = np.bincount(y[y >= 0].reshape(-1), minlength=num_classes)
    counts = np.maximum(counts, 1)
    w = counts.sum() / (num_classes * counts)
    return (w / w.mean()).astype(np.float32)


def rmse_log(pred, y):
    valid = y >= 0
    d = np.log1p(np.maximum(pred[valid], 0)) - np.log1p(y[valid])
    return float(np.sqrt((d ** 2).mean()))


# ---------------------------------------------------------------------------
# JAX side
# ---------------------------------------------------------------------------


def _make_cfg(task, x, batch, lr, class_weights=None):
    from instageo_tpu.configs.config import load_config

    overrides = {
        "dataloader.img_size": x.shape[-1],
        "dataloader.bands": list(range(x.shape[1])),
        "dataloader.temporal_dim": x.shape[2],
        "model.model_name": "prithvi_eo_tiny",
        "model.load_pretrained_weights": False,
        "train.batch_size": batch,
        "train.ignore_index": -1,
        "train.learning_rate": lr,
        "train.scheduler": False,
        "tpu.precision": "f32",
    }
    if task == "crop":
        overrides["model.num_classes"] = NUM_CROP_CLASSES
        overrides["train.class_weights"] = [float(w) for w in class_weights]
    elif task == "regression":
        overrides["is_reg_task"] = True
        overrides["model.use_log_scale"] = True
    elif task == "distill":
        overrides["train.distillation"] = True
    return load_config("config", overrides=overrides)


def run_jax(task, cfg, x, y, xv, yv, steps, batch, eval_every,
            teacher=None):
    from instageo_tpu.parallel.mesh import make_mesh
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import Trainer

    import jax.numpy as jnp

    model, variables = create_model(cfg)
    trainer = Trainer(cfg, model, variables, mesh=make_mesh(1),
                      teacher=teacher)
    rng = jax.random.PRNGKey(0)
    curve = []
    for step in range(steps):
        sl = slice((step * batch) % len(x), (step * batch) % len(x) + batch)
        trainer.run_train_epoch(iter([(x[sl], y[sl])]),
                                jax.random.fold_in(rng, step), batch)
        if (step + 1) % eval_every == 0 or step == steps - 1:
            logits = trainer.model.apply(
                {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats},
                jnp.asarray(xv), train=False)
            if task == "regression":
                pred = np.expm1(np.asarray(logits)[:, 0])
                curve.append((step + 1, rmse_log(pred, yv)))
            else:
                pred = np.asarray(jnp.argmax(logits, axis=1))
                nc = NUM_CROP_CLASSES if task == "crop" else 2
                curve.append((step + 1, miou_from_preds(pred, yv, nc)))
    return trainer, curve


# ---------------------------------------------------------------------------
# Torch side
# ---------------------------------------------------------------------------


def run_torch(task, init_sd_np, arch, x, y, xv, yv, steps, batch, eval_every,
              lr, class_weights=None, teacher_sd=None, seed=0):
    import torch
    import torch.nn.functional as F

    torch.manual_seed(seed)
    sd, trainable = {}, []
    for k, v in init_sd_np.items():
        t = torch.from_numpy(np.ascontiguousarray(v))
        if "running_" in k:
            sd[k] = t
        else:
            t.requires_grad_(True)
            sd[k] = t
            trainable.append(t)
    opt = torch.optim.AdamW(trainable, lr=lr, weight_decay=1e-2)

    kw = dict(patch_size=arch.patch_size, embed_dim=arch.embed_dim,
              depth=arch.depth, num_heads=arch.num_heads,
              num_frames=x.shape[2])
    if teacher_sd is not None:
        tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in teacher_sd.items()}
    wt = (torch.from_numpy(class_weights) if class_weights is not None
          else None)
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y)
    xvt = torch.from_numpy(xv)

    def loss_fn(logits, target):
        if task == "regression":
            pred = logits[:, 0]
            mask = (target != -1.0).float()
            tgt = torch.where(mask > 0,
                              torch.log1p(target.clamp_min(-0.999999)),
                              torch.zeros_like(target))
            return ((pred - tgt) ** 2 * mask).sum() / mask.sum().clamp_min(1)
        # Reference CE semantics: reduction="none" + masked mean of w[y]·nll
        mask = (target != -1).float()
        safe = target.clamp_min(0).long()
        logp = F.log_softmax(logits.float(), dim=1)
        nll = -logp.gather(1, safe[:, None]).squeeze(1)
        if wt is not None:
            nll = nll * wt[safe]
        loss = (nll * mask).sum() / mask.sum().clamp_min(1)
        if teacher_sd is not None:
            with torch.no_grad():
                t_logits = seg_forward_train(xt_sl, tsd, training=False, **kw)
            logp_s = F.log_softmax(logits.float(), dim=1)
            p_t = F.softmax(t_logits.float(), dim=1)
            logp_t = F.log_softmax(t_logits.float(), dim=1)
            kl = (p_t * (logp_t - logp_s)).sum(dim=1)
            loss = loss + (kl * mask).sum() / mask.sum().clamp_min(1)
        return loss

    curve = []
    for step in range(steps):
        sl = slice((step * batch) % len(x), (step * batch) % len(x) + batch)
        xt_sl = xt[sl]
        logits = seg_forward_train(xt_sl, sd, training=True, **kw)
        loss = loss_fn(logits, yt[sl])
        opt.zero_grad()
        loss.backward()
        opt.step()
        if (step + 1) % eval_every == 0 or step == steps - 1:
            with torch.no_grad():
                pv = seg_forward_train(xvt, sd, training=False, **kw)
            if task == "regression":
                pred = np.expm1(pv[:, 0].numpy())
                curve.append((step + 1, rmse_log(pred, yv)))
            else:
                pred = pv.argmax(dim=1).numpy()
                nc = NUM_CROP_CLASSES if task == "crop" else 2
                curve.append((step + 1, miou_from_preds(pred, yv, nc)))
    return curve


# ---------------------------------------------------------------------------


def _export_init(cfg, x):
    """Deterministic re-init of the same model, exported to torch layout."""
    from instageo_tpu.models.checkpoint import seg_variables_to_torch
    from instageo_tpu.models.registry import get_arch
    from instageo_tpu.train.factory import create_model

    _, init_vars = create_model(cfg)
    arch = get_arch("prithvi_eo_tiny", in_chans=x.shape[1],
                    num_frames=x.shape[2], img_size=x.shape[-1])
    return seg_variables_to_torch(init_vars, arch, prefix=""), arch


def _train_teacher(x, y, steps, batch, lr):
    """Quick teacher for the distillation task (trained in this framework,
    then exported so BOTH sides distill from identical teacher weights)."""
    from convergence_parity import make_dataset  # noqa: F401 (same family)

    cfg = _make_cfg("seg", x, batch, lr)
    trainer, _ = run_jax("seg", cfg, x, y, x[:8], y[:8], steps, batch,
                         eval_every=steps)
    from instageo_tpu.models.checkpoint import seg_variables_to_torch
    from instageo_tpu.models.registry import get_arch

    arch = get_arch("prithvi_eo_tiny", in_chans=x.shape[1],
                    num_frames=x.shape[2], img_size=x.shape[-1])
    variables = {"params": jax.device_get(trainer.state.params),
                 "batch_stats": jax.device_get(trainer.state.batch_stats)}
    return (trainer.model, variables,
            seg_variables_to_torch(variables, arch, prefix=""))


def main(task, steps, batch=8, eval_every=None, lr=1e-3,
         check_bars=True):
    eval_every = eval_every or max(steps // 5, 1)
    t0 = time.time()
    if task == "crop":
        x, y = make_crop_dataset(256, seed=0)
        xv, yv = make_crop_dataset(64, seed=1)
        weights = compute_class_weights(y, NUM_CROP_CLASSES)
        cfg = _make_cfg(task, x, batch, lr, class_weights=weights)
        trainer, jc = run_jax(task, cfg, x, y, xv, yv, steps, batch, eval_every)
        sd, arch = _export_init(cfg, x)
        tc = run_torch(task, sd, arch, x, y, xv, yv, steps, batch,
                       eval_every, lr, class_weights=weights)
        # 13-class chance mIoU ≈ 0.04; both stacks reach ~0.24-0.35 by
        # 400-800 steps on this task (parity is the delta check).
        metric, higher_better, min_bar, tol = "miou", True, 0.20, 0.08
    elif task == "regression":
        x, y = make_reg_dataset(256, seed=0)
        xv, yv = make_reg_dataset(64, seed=1)
        cfg = _make_cfg(task, x, batch, lr)
        trainer, jc = run_jax(task, cfg, x, y, xv, yv, steps, batch, eval_every)
        sd, arch = _export_init(cfg, x)
        tc = run_torch(task, sd, arch, x, y, xv, yv, steps, batch,
                       eval_every, lr)
        metric, higher_better, min_bar, tol = "rmse_log", False, 0.45, 0.06
    elif task == "distill":
        from convergence_parity import make_dataset

        x, y = make_dataset(256, seed=0)
        xv, yv = make_dataset(64, seed=1)
        t_model, t_vars, t_sd = _train_teacher(x, y, max(steps // 2, 50),
                                               batch, lr)
        cfg = _make_cfg(task, x, batch, lr)
        trainer, jc = run_jax(task, cfg, x, y, xv, yv, steps, batch,
                              eval_every, teacher=(t_model, t_vars))
        sd, arch = _export_init(cfg, x)
        tc = run_torch(task, sd, arch, x, y, xv, yv, steps, batch,
                       eval_every, lr, teacher_sd=t_sd)
        metric, higher_better, min_bar, tol = "miou", True, 0.80, 0.06
    else:
        raise SystemExit(f"unknown task {task}")

    jf, tf = jc[-1][1], tc[-1][1]
    # Round-4 tightening (VERDICT r3 #6): every checkpoint past the
    # warm-up horizon must hold tolerance, not just the final step (the
    # 13-class run's step-160 0.083 excursion vs tol 0.08 recorded in
    # PARITY.md §2b is exactly what final-only asserting hides).
    warmup_steps = steps * 0.5
    post_env = post_warmup_envelope(jc, tc, warmup_steps)
    report = {"task": task, "steps": steps, "metric": metric,
              "jax_curve": jc, "torch_curve": tc,
              "jax_final": jf, "torch_final": tf,
              "delta": abs(jf - tf), "tolerance": tol,
              "warmup_steps": warmup_steps,
              "post_warmup_max_delta": post_env,
              "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(report, indent=1))
    if check_bars:
        if higher_better:
            assert jf >= min_bar, f"jax {metric} {jf} < {min_bar}"
            assert tf >= min_bar, f"torch {metric} {tf} < {min_bar}"
        else:
            assert jf <= min_bar, f"jax {metric} {jf} > {min_bar}"
            assert tf <= min_bar, f"torch {metric} {tf} > {min_bar}"
    assert post_env <= tol, (
        f"diverged past warm-up: max checkpoint delta {post_env:.4f} > "
        f"{tol} (finals: jax {jf:.4f} vs torch {tf:.4f})")
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["crop", "regression", "distill"],
                    required=True)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=None)
    args = ap.parse_args()
    main(args.task, args.steps, eval_every=args.eval_every)
