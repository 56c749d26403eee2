"""One-command replication runbook (``mode=replica``).

The reference's headline quality numbers (its README table, e.g.
Sen1Floods11 mIoU 88.53 — ``/root/reference/README.md:31``) are produced
by a loose chain of shell steps: a data script, a training script
(``/root/reference/experiments_dir/train/flood_mapping/sen1floods_replica.sh:41-55``),
then reading metrics out of eval logs by hand. This module stitches the
post-data part of that chain — dataset stats → fine-tune → val/test
evaluation → README-table report — into ONE unattended CLI invocation::

    python -m instageo_tpu.train.run --config-name=sen1floods11 \\
        mode=replica root_dir=... train_filepath=... valid_filepath=... \\
        test_filepath=...

Every stage re-enters :func:`instageo_tpu.train.run.main` through the
persisted ``.hydra/config.yaml`` — the replica exercises the exact same
CLI surface a human would, so a green replica run certifies the whole
chain, not a private shortcut. Outputs land in ``run_dir``:

* ``report.json`` — machine-readable stage results + reference deltas;
* ``REPORT.md``  — the BASELINE.md-format table row next to the
  reference's published row, ready to paste.

Network/weights gates: pretrained weights must exist locally
(``model.pretrained_path`` or ``$PRITHVI_PRETRAINED_PATH``) unless
``replica.require_pretrained=False`` (CI runs synthetic fixtures with a
fresh init). Data download stays in the gated shell scripts under
``experiments/data/`` — this mode starts from chips on disk.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, List, Optional

log = logging.getLogger(__name__)

# Published reference rows this runbook replicates, keyed by
# ``replica.task`` (defaulted in the task configs). Values are the
# reference README table in percent (/root/reference/README.md:31-41);
# metric keys match this trainer's eval outputs.
REFERENCE_TARGETS: Dict[str, Dict[str, Any]] = {
    "sen1floods11": {
        "task": "Flood mapping (Sen1Floods11)",
        "config": "InstaGeo-Baseline",
        "gfm": "Prithvi-V1-100M",
        "mIoU": 88.53, "Acc": 97.24, "mF1": 93.71, "ROC-AUC": 99.16,
        "source": "reference README.md:31",
    },
    "multitemporal_crop_classification": {
        "task": "Multi-temporal crop seg (US)",
        "config": "InstaGeo-Replica",
        "gfm": "Prithvi-V1-100M",
        "mIoU": 47.87, "Acc": 66.10, "mF1": 64.19, "ROC-AUC": 95.82,
        "source": "reference README.md:36",
    },
    "locust": {
        "task": "Locust breeding ground",
        "config": "InstaGeo-Replica",
        "gfm": "Prithvi-V1-100M",
        "mIoU": 73.30, "Acc": 84.60, "mF1": 84.60, "ROC-AUC": 88.66,
        "source": "reference README.md:41",
    },
}

_METRIC_COLS = ("mIoU", "Acc", "mF1", "ROC-AUC")
# trainer.run_eval_epoch prefixes every key with "test_" regardless of
# which split's file it reads (run.py mode=eval).
_EVAL_KEYS = {"mIoU": "test_IoU", "Acc": "test_Acc", "mF1": "test_F1",
              "ROC-AUC": "test_roc_auc"}


def _check_pretrained_gate(cfg: Any) -> Optional[str]:
    """A REAL replica is meaningless from a fresh init — fail fast and
    loudly before hours of training, unless CI explicitly opts out."""
    rep = cfg.get("replica") or {}
    if not _as_bool(rep.get("require_pretrained", True)):
        return None  # the ONLY opt-out (CI fixtures set it)
    if not bool(cfg.model.get("load_pretrained_weights", False)):
        # Not a silent bypass: turning off the pretrained load while the
        # gate is up would still present a fresh-init run as a replica.
        raise RuntimeError(
            "mode=replica with model.load_pretrained_weights=False would "
            "replicate from a fresh init — pass "
            "replica.require_pretrained=False to knowingly do that "
            "(CI fixtures do), or enable the pretrained load.")
    path = cfg.model.get("pretrained_path") or os.environ.get(
        "PRITHVI_PRETRAINED_PATH")
    if not path or not os.path.exists(str(path)):
        raise RuntimeError(
            "mode=replica needs local pretrained encoder weights: set "
            "model.pretrained_path=<file> or export "
            "PRITHVI_PRETRAINED_PATH=<file> (download per MIGRATION.md), "
            "or pass replica.require_pretrained=False to knowingly "
            "replicate from a fresh init (CI fixtures do this).")
    return str(path)


def _as_bool(v: Any) -> bool:
    if isinstance(v, str):
        return v.strip().lower() in ("1", "true", "yes", "on")
    return bool(v)


def _fmt(v: Any) -> str:
    return f"{v:.2f}" if isinstance(v, (int, float)) else "—"


def _hardware() -> str:
    try:
        import jax

        d = jax.devices()[0]
        return f"{d.platform}:{getattr(d, 'device_kind', '?')} x{jax.device_count()}"
    except Exception:  # pragma: no cover - report must never die on this
        return "unknown"


def _write_report(run_dir: str, report: Dict[str, Any]) -> None:
    with open(os.path.join(run_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2, default=str)

    ref = report.get("reference")
    lines = [
        "# Replica report",
        "",
        f"Generated by `mode=replica` on {report['hardware']}; "
        f"total {report['duration_s']:.0f}s "
        f"(train {report['stages'].get('train_s', 0):.0f}s).",
        "",
        "| Task | Config | GFM | mIoU | Acc | mF1 | ROC-AUC | Hardware |",
        "|---|---|---|---|---|---|---|---|",
    ]
    task = (ref or {}).get("task", report["task"])
    gfm = report["model"]
    for split, m in report["metrics"].items():
        cells = " | ".join(_fmt(m.get(k)) for k in _METRIC_COLS)
        lines.append(f"| {task} | instageo_tpu replica ({split}) | {gfm} "
                     f"| {cells} | {report['hardware']} |")
    if ref:
        cells = " | ".join(_fmt(ref.get(k)) for k in _METRIC_COLS)
        lines.append(f"| {task} | {ref['config']} (reference, "
                     f"{ref['source']}) | {ref['gfm']} | {cells} "
                     f"| unspecified |")
        deltas = report.get("deltas") or {}
        if deltas:
            cells = " | ".join(_fmt(deltas.get(k)) for k in _METRIC_COLS)
            lines.append(f"| {task} | delta (test − reference) | — "
                         f"| {cells} | — |")
    lines += ["",
              "Metrics are percent, matching the reference README table. "
              "Stage configs: see `.hydra/config.yaml`; eval metrics per "
              "split in `eval_val.json` / `eval_test.json` next to this "
              "report (the `eval_*/` directories hold each stage's "
              "re-saved config)."]
    with open(os.path.join(run_dir, "REPORT.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def run_replica(cfg: Any) -> Dict[str, Any]:
    """Drive stats → train → eval(val, test) → report off a resolved cfg."""
    # Import here: run.py imports this module lazily and vice versa.
    from instageo_tpu.configs.config import save_config
    from instageo_tpu.train.run import check_required_flags
    from instageo_tpu.train.run import main as run_main

    t0 = time.time()
    check_required_flags(
        ["root_dir", "train_filepath", "valid_filepath", "test_filepath"],
        cfg)
    rep = cfg.get("replica") or {}
    pre_path = _check_pretrained_gate(cfg)

    run_dir = cfg.get("run_dir") or os.path.join(
        "outputs", "replica", time.strftime("%Y-%m-%d_%H-%M-%S"))
    os.makedirs(run_dir, exist_ok=True)
    save_config(cfg, run_dir)
    hydra_dir = os.path.join(run_dir, ".hydra")
    base = ["--config-path", hydra_dir, "--config-name", "config",
            f"run_dir={run_dir}"]
    # One decoded-chip cache shared by every stage: stats (stage 1) pays
    # the TIFF decode once, train's epochs>=1 and both eval splits read
    # .npy entries (dataloader.cache_dir). Opt out with
    # replica.chip_cache=false or point dataloader.cache_dir elsewhere.
    if _as_bool(rep.get("chip_cache", True)) and \
            not cfg.dataloader.get("cache_dir"):
        base.append(
            f"dataloader.cache_dir={os.path.join(run_dir, 'chip_cache')}")
    stages: Dict[str, float] = {}
    report: Dict[str, Any] = {
        "task": str(rep.get("task", "")) or "unknown",
        "model": str(cfg.model.get("model_name")),
        "pretrained": pre_path,
        "epochs": int(cfg.train.get("num_epochs", 0)),
        "hardware": _hardware(),
        "stages": stages,
        "metrics": {},
    }

    # ---- Stage 1: dataset statistics (reference stats mode). All three
    # reference recipes feed the computed mean/std into training
    # (replica.apply_stats); only the crop recipe also feeds back the
    # computed class weights (replica.apply_class_weights,
    # cropclass2022.sh) — flood/locust keep their config's weights.
    extra: List[str] = []
    if _as_bool(rep.get("stats", True)):
        t = time.time()
        stats = run_main(base + ["mode=stats"])
        stages["stats_s"] = time.time() - t
        report["dataset_stats"] = stats
        if _as_bool(rep.get("apply_stats", True)):
            extra += [f"dataloader.mean={json.dumps(stats['mean'])}",
                      f"dataloader.std={json.dumps(stats['std'])}"]
        if _as_bool(rep.get("apply_class_weights", False)) and \
                stats.get("class_weights"):
            extra.append(
                f"train.class_weights={json.dumps(stats['class_weights'])}")
        log.info("Replica stage 1/4 (stats) done in %.1fs", stages["stats_s"])

    # ---- Stage 2: fine-tune. mode=train re-saves the resolved config
    # (incl. any applied stats) into run_dir/.hydra, so the eval stages
    # below reload exactly what trained.
    t = time.time()
    history = run_main(base + ["mode=train"] + extra)
    stages["train_s"] = time.time() - t
    report["history"] = {k: v for k, v in history.items()
                         if isinstance(v, (int, float))}
    ckpt = os.path.join(run_dir, "instageo_best_checkpoint")
    if not os.path.exists(ckpt):
        raise RuntimeError(f"training produced no checkpoint at {ckpt}")
    report["checkpoint"] = ckpt
    log.info("Replica stage 2/4 (train) done in %.1fs", stages["train_s"])

    # ---- Stage 3: evaluate both held-out splits, like the reference
    # script's val+test loop (sen1floods_replica.sh:57-79 equivalent).
    splits = {"val": cfg.get("valid_filepath"), "test": cfg.get("test_filepath")}
    for split, fp in splits.items():
        t = time.time()
        metrics = run_main(base + [
            "mode=eval", f"checkpoint_path={ckpt}", f"test_filepath={fp}",
            f"run_dir={os.path.join(run_dir, f'eval_{split}')}"])
        stages[f"eval_{split}_s"] = time.time() - t
        report["metrics"][split] = {
            col: 100.0 * float(metrics[key])
            for col, key in _EVAL_KEYS.items() if key in metrics}
        with open(os.path.join(run_dir, f"eval_{split}.json"), "w") as f:
            json.dump(metrics, f, indent=2, default=str)
    log.info("Replica stage 3/4 (eval) done")

    # ---- Stage 4: the README-table row + deltas vs the published run.
    ref = REFERENCE_TARGETS.get(report["task"])
    report["reference"] = ref
    if ref and "test" in report["metrics"]:
        report["deltas"] = {
            k: report["metrics"]["test"][k] - ref[k]
            for k in _METRIC_COLS
            if k in report["metrics"]["test"] and isinstance(ref.get(k), (int, float))}
    report["duration_s"] = time.time() - t0
    _write_report(run_dir, report)
    log.info("Replica stage 4/4 (report) → %s/REPORT.md", run_dir)
    print(json.dumps({"run_dir": run_dir,
                      "metrics": report["metrics"],
                      "deltas": report.get("deltas")}))
    return report
