"""Run CLI: ``python -m instageo_tpu.train.run mode=... train.*=...``.

The reference's Hydra entry point (``instageo/model/run.py:60-246``) with the
same mode surface — ``train``, ``eval``, ``chip_inference``, ``stats`` — and
the same config keys, re-hosted on the framework's config system and TPU
training stack. Two beyond-parity modes: ``sliding_inference`` (granule
streaming) and ``export`` (StableHLO serving artifact, serve/export.py).
Seed 1042 matches the reference (run.py:50-53); determinism comes from
jax's stateless PRNG rather than cudnn flags.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from datetime import datetime
from functools import partial
from typing import Any, List, Optional

from instageo_tpu.configs.config import (
    check_required_flags,
    get_augmentations,
    load_config_from_argv,
    save_config,
)

log = logging.getLogger("instageo_tpu.run")

SEED = 1042


def _make_dataset(filepath: str, cfg: Any, preprocess_func, include_filenames=False):
    from instageo_tpu.data.dataloader import InstaGeoDataset

    return InstaGeoDataset(
        filename=filepath,
        input_root=cfg.root_dir,
        preprocess_func=preprocess_func,
        chip_no_data_value=cfg.dataloader.get("no_data_value", -9999) or 0,
        label_no_data_value=cfg.train.get("ignore_index", -100),
        replace_label=(tuple(cfg.dataloader.replace_label)
                       if cfg.dataloader.get("replace_label") else None),
        reduce_to_zero=bool(cfg.dataloader.get("reduce_to_zero", False)),
        constant_multiplier=float(cfg.dataloader.get("constant_multiplier", 1.0)),
        bands=cfg.dataloader.get("bands"),
        include_filenames=include_filenames,
        cache_dir=cfg.dataloader.get("cache_dir"),
    )


def _train_preprocess(cfg: Any, augment: bool = True, stats_mode: bool = False):
    from instageo_tpu.data.dataloader import process_and_augment

    mean = [0.0] * len(cfg.dataloader.mean) if stats_mode else list(cfg.dataloader.mean)
    std = [1.0] * len(cfg.dataloader.std) if stats_mode else list(cfg.dataloader.std)
    return partial(
        process_and_augment,
        mean=mean,
        std=std,
        temporal_size=int(cfg.dataloader.get("temporal_dim", 1)),
        im_size=int(cfg.dataloader.get("img_size", 224)),
        label_no_data_value=cfg.train.get("ignore_index", -100),
        chip_no_data_value=cfg.dataloader.get("no_data_value", -9999) or 0,
        max_pixel_value=float(cfg.dataloader.get("max_pixel_value", 10000)),
        augmentations=get_augmentations(cfg) if (augment and not stats_mode) else None,
    )


def _run_dir(cfg: Any) -> str:
    run_dir = cfg.get("run_dir") or os.path.join(
        "outputs", datetime.now().strftime("%Y-%m-%d/%H-%M-%S"))
    os.makedirs(run_dir, exist_ok=True)
    return run_dir


def main(argv: Optional[List[str]] = None) -> Any:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    cfg = load_config_from_argv(argv if argv is not None else sys.argv[1:])
    log.info("Resolved config:\n%s", cfg.to_yaml())
    from instageo_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # re-runs/eval-after-train start hot
    start_time = time.time()
    mode = cfg.get("mode", "train")

    from instageo_tpu.data.dataloader import (
        create_dataloader,
        eval_collate,
        infer_collate,
        process_test,
    )

    batch_size = int(cfg.train.get("batch_size", 8))

    if mode == "stats":
        from instageo_tpu.train.stats import compute_stats

        check_required_flags(["root_dir", "train_filepath"], cfg)
        ds = _make_dataset(cfg.train_filepath, cfg, _train_preprocess(cfg, stats_mode=True))
        loader = create_dataloader(
            ds, batch_size, shuffle=True,
            num_workers=int(cfg.dataloader.get("num_workers", 1)),
            worker_mode=str(cfg.dataloader.get("worker_mode", "thread")))
        mean, std, class_weights = compute_stats(
            loader, cfg.get("is_reg_task", False),
            ignore_index=int(cfg.train.get("ignore_index", -1)))
        print(json.dumps({"mean": mean, "std": std, "class_weights": class_weights}))
        return {"mean": mean, "std": std, "class_weights": class_weights}

    if mode == "replica":
        # One-command replication runbook: stats → train → eval(val+test)
        # → BASELINE-format report (train/replica.py). Each stage
        # re-enters this main() through the persisted .hydra config.
        from instageo_tpu.train.replica import run_replica

        return run_replica(cfg)

    from instageo_tpu.parallel.mesh import mesh_from_config
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import Trainer

    model, variables = create_model(cfg, seed=SEED)
    mesh = mesh_from_config(cfg.get("tpu"))

    if mode == "train":
        check_required_flags(["root_dir", "train_filepath", "valid_filepath"], cfg)
        from instageo_tpu.train.checkpointing import BestCheckpointer

        run_dir = _run_dir(cfg)
        save_config(cfg, run_dir)
        train_ds = _make_dataset(cfg.train_filepath, cfg, _train_preprocess(cfg))
        val_ds = _make_dataset(cfg.valid_filepath, cfg,
                               _train_preprocess(cfg, augment=False))
        nw = int(cfg.dataloader.get("num_workers", 1))
        wm = str(cfg.dataloader.get("worker_mode", "thread"))
        train_loader = create_dataloader(train_ds, batch_size, shuffle=True,
                                         num_workers=nw, worker_mode=wm)
        val_loader = create_dataloader(val_ds, batch_size, num_workers=nw,
                                       worker_mode=wm)

        teacher = None
        if cfg.train.get("distillation") and cfg.train.get("teacher_ckpt_path"):
            from instageo_tpu.train.factory import build_model, load_finetuned

            t_model = build_model(cfg)
            t_vars = load_finetuned(cfg.train.teacher_ckpt_path, t_model, cfg,
                                    init_vars=variables)
            teacher = (t_model, t_vars)

        trainer = Trainer(cfg, model, variables, mesh=mesh, teacher=teacher,
                          steps_per_epoch=max(1, len(train_loader)))
        resume_from = cfg.get("resume_from")
        if resume_from:
            # Mid-training resume: step count, optimizer moments (scheduler
            # phase), batch stats, and best_metric all continue — unlike
            # checkpoint_path, which is an eval/warm-start params load.
            import jax

            trainer.restore(str(resume_from))
            log.info("Resumed training state from %s (step %d)",
                     resume_from, int(jax.device_get(trainer.state.step)))
        ckpt = BestCheckpointer(run_dir)

        from instageo_tpu.utils.experiment_logger import init_experiment_logger
        from instageo_tpu.utils.telemetry import (
            EmissionsTracker,
            count_params,
            get_model_complexity,
        )

        exp_logger = init_experiment_logger(cfg, run_dir)
        exp_logger.log_config(cfg)
        tracker = EmissionsTracker(name="train", output_dir=run_dir)
        tracker.start()
        from instageo_tpu.utils.telemetry import profile_trace

        profile = bool((cfg.get("tpu") or {}).get("profile", False))
        with profile_trace(os.path.join(run_dir, "profile"), enabled=profile):
            history = trainer.fit(
                lambda: iter(train_loader), lambda: iter(val_loader),
                checkpointer=ckpt, seed=SEED,
                log_fn=lambda m: exp_logger.log_metrics(m, step=m.get("epoch")))
        carbon = tracker.stop()
        duration = time.time() - start_time
        # Model complexity from XLA cost analysis (replaces ptflops logging,
        # reference run.py:169-174 + utils.py:380-435).
        try:
            import jax.numpy as jnp

            c = int(model.in_chans)  # per-frame channels
            t = int(cfg.dataloader.get("temporal_dim", 1))
            s = int(cfg.dataloader.get("img_size", 224))
            x = jnp.zeros((1, c, t, s, s), jnp.float32)
            complexity = get_model_complexity(
                lambda v, xx: model.apply(v, xx, train=False),
                {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}, x)
            complexity["params"] = count_params(trainer.state.params)
            exp_logger.log_metrics({**complexity,
                                    "train_duration_s": duration, **carbon})
            log.info("Model complexity: %.2f GFLOPs/forward, %d params",
                     complexity["gflops"], complexity["params"])
        except Exception as e:
            log.warning("Complexity logging failed: %s", e)
        exp_logger.stop()
        log.info("Training completed in %.1fs; best %s; checkpoint: %s",
                 duration, trainer.best_metric, ckpt.path)
        print(json.dumps({k: v for k, v in history.items()
                          if isinstance(v, (int, float))}))
        return history

    if mode == "eval":
        check_required_flags(["root_dir", "test_filepath", "checkpoint_path"], cfg)
        test_pre = partial(
            process_test,
            mean=list(cfg.dataloader.mean),
            std=list(cfg.dataloader.std),
            temporal_size=int(cfg.dataloader.get("temporal_dim", 1)),
            img_size=int(cfg.test.get("img_size", 512)),
            crop_size=int(cfg.test.get("crop_size", 224)),
            stride=int(cfg.test.get("stride", 224)),
        )
        test_ds = _make_dataset(cfg.test_filepath, cfg, test_pre)
        test_loader = create_dataloader(
            test_ds, batch_size, collate_fn=eval_collate,
            num_workers=int(cfg.dataloader.get("num_workers", 1)),
            worker_mode=str(cfg.dataloader.get("worker_mode", "thread")))
        trainer = Trainer(cfg, model, variables, mesh=mesh)
        # crops-per-image × batch composes the effective eval batch
        crops = max(1, (int(cfg.test.get("img_size", 512))
                        - int(cfg.test.get("crop_size", 224)))
                    // int(cfg.test.get("stride", 224)) + 1) ** 2
        plot_reg = bool(cfg.get("is_reg_task")) and bool(
            cfg.model.get("plot_reg_results", False))
        metrics = trainer.run_eval_epoch(
            iter(test_loader), batch_size * crops, "test",
            collect_outputs=plot_reg)
        if plot_reg and "_preds" in metrics:
            from instageo_tpu.train.plots import create_regression_plot

            out_png = os.path.join(_run_dir(cfg), "regression_test.png")
            create_regression_plot(metrics.pop("_preds"),
                                   metrics.pop("_labels"), metrics, out_png,
                                   "test")
            log.info("Regression plot written to %s", out_png)
        metrics.pop("_preds", None)
        metrics.pop("_labels", None)
        log.info("Evaluation took %.1fs", time.time() - start_time)
        print(json.dumps(metrics))
        return metrics

    if mode == "chip_inference":
        check_required_flags(["root_dir", "test_filepath", "checkpoint_path"], cfg)
        from instageo_tpu.serve.infer import chip_inference

        out_dir = os.path.join(cfg.root_dir, "predictions")
        # Deterministic CENTER crop: save_prediction anchors the output
        # raster at the chip's center window; a random crop would write
        # spatially mis-anchored predictions (see serve/pipeline.py).
        infer_pre = partial(_train_preprocess(cfg, augment=False),
                            crop="center")
        ds = _make_dataset(cfg.test_filepath, cfg, infer_pre, include_filenames=True)
        loader = create_dataloader(
            ds, batch_size, collate_fn=infer_collate,
            num_workers=int(cfg.dataloader.get("num_workers", 1)),
            worker_mode=str(cfg.dataloader.get("worker_mode", "thread")))
        n, dt = chip_inference(loader, out_dir, model, variables,
                               is_reg_task=bool(cfg.get("is_reg_task", False)))
        print(json.dumps({"chips": n, "seconds": dt,
                          "chips_per_sec": n / dt if dt else 0.0}))
        return n

    if mode == "sliding_inference":
        # Granule-scale streaming inference straight from a chip-creator
        # dataset JSON (the reference's demo-notebook workflow:
        # notebooks/InstaGeo_Demo.ipynb runs chip_creator with
        # --processing_method=download-only then
        # `mode=sliding_inference test_filepath=hls_dataset.json`; the
        # reference CLI never implemented the mode — here it streams
        # whole tiles through serve/granule.py, no chip files).
        check_required_flags(["root_dir", "test_filepath", "checkpoint_path"],
                             cfg)
        from instageo_tpu.data.sources import hls, s1, s2
        from instageo_tpu.serve.granule import granule_inference_to_file

        openers = {"HLS": hls.open_hls_stac_items,
                   "S2": s2.open_s2_stac_items,
                   "S1": s1.open_s1_stac_items}
        source = str(cfg.test.get("data_source", "HLS")).upper()
        with open(cfg.test_filepath) as f:
            dataset = json.load(f)
        out_dir = os.path.join(cfg.root_dir, "predictions")
        os.makedirs(out_dir, exist_ok=True)
        start_time = time.time()
        n = 0
        for key, tile_dict in dataset.items():
            bands, _masks, transform, crs = openers[source](
                tile_dict, load_masks=False)
            safe = key.replace("/", "_")[:128]
            granule_inference_to_file(
                bands,
                os.path.join(out_dir, f"prediction_{safe}.tif"),
                model, variables,
                mean=list(cfg.dataloader.mean), std=list(cfg.dataloader.std),
                transform=transform, crs=crs,
                chip_size=int(cfg.dataloader.get("img_size", 224)),
                temporal_size=int(cfg.dataloader.get("temporal_dim", 1)),
                bands=cfg.dataloader.get("bands"),
                constant_multiplier=float(
                    cfg.dataloader.get("constant_multiplier", 1.0)),
                is_reg_task=bool(cfg.get("is_reg_task", False)),
                batch_size=batch_size,
                no_data_value=cfg.dataloader.get("no_data_value", -9999) or 0,
            )
            n += 1
        dt = time.time() - start_time
        print(json.dumps({"granules": n, "seconds": dt,
                          "out_dir": out_dir}))
        return n

    if mode == "export":
        # Serialize the serving forward to a deployable StableHLO
        # artifact (serve/export.py): code-free, symbolic-batch (pin
        # with export.batch_size), weights stay in the checkpoint.
        check_required_flags(["root_dir", "checkpoint_path"], cfg)
        from instageo_tpu.serve.export import export_predict

        exp = cfg.get("export") or {}
        out_path = str(exp.get("path") or
                       os.path.join(cfg.root_dir, "predict.stablehlo"))
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        bs = exp.get("batch_size")
        export_predict(
            model, variables, out_path,
            num_bands=int(model.in_chans),
            img_size=int(cfg.dataloader.get("img_size", 224)),
            temporal_dim=int(cfg.dataloader.get("temporal_dim", 1)),
            is_reg_task=bool(cfg.get("is_reg_task", False)),
            probabilities=bool(exp.get("probabilities", False)),
            batch_size=None if bs in (None, "null") else int(bs),
        )
        print(json.dumps({"artifact": out_path,
                          "bytes": os.path.getsize(out_path),
                          "seconds": time.time() - start_time}))
        return out_path

    raise ValueError(f"Unknown mode {mode!r}")


if __name__ == "__main__":
    main()
