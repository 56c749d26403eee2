"""Model server: persistent jitted inference engine (Ray Serve replacement).

The reference serves batched inference through a detached Ray Serve
deployment (``instageo/model/model_server.py``); on TPU a separate actor
boundary only adds serialization cost, so the server here is an in-process
engine: the model compiles once, stays resident on device, and requests
stream through a double-buffered host→device queue. The public surface
mirrors the Ray deployment's (``evaluate``, ``chip_inference``,
``health_check``, ``get_device_info``).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, Iterable, Optional

import jax

from instageo_tpu.parallel.mesh import mesh_from_config, replicate_tree
from instageo_tpu.serve.infer import chip_inference as run_chip_inference
from instageo_tpu.train.factory import create_model
from instageo_tpu.train.trainer import Trainer

log = logging.getLogger(__name__)


class ModelServer:
    """Loads a model per config and serves eval/inference requests.

    Reference surface: model_server.py:48-154.
    """

    def __init__(self, cfg: Any) -> None:
        self.cfg = cfg
        self.model, self.variables = create_model(cfg)
        self.mesh = mesh_from_config(cfg.get("tpu"))
        from instageo_tpu.parallel.tp import has_model_axis, tp_place

        if int(self.mesh.devices.size) > 1:
            # Any multi-device serving mesh: the clone carries the mesh —
            # same rule as train/trainer.py — both for the attention
            # sharding constraints (TP) and so the attention body KNOWS
            # it is on a mesh and falls back to XLA instead of emitting a
            # pallas_call (which has no GSPMD partitioning rule) into a
            # sharded program. Params are TP-sharded when a model axis
            # exists (tpu.tp>1 — lower latency for the large variants at
            # small serving batches), replicated for pure-DP meshes.
            self.model = self.model.clone(tp_mesh=self.mesh)
            place = (tp_place if has_model_axis(self.mesh)
                     else replicate_tree)
            self.variables = {
                **{k: replicate_tree(v, self.mesh)
                   for k, v in self.variables.items() if k != "params"},
                "params": place(self.variables["params"], self.mesh),
            }
        self._trainer: Optional[Trainer] = None
        self.start_time = time.time()
        self.requests_served = 0
        log.info("ModelServer ready on %s", jax.devices()[0].platform)

    def _get_trainer(self) -> Trainer:
        if self._trainer is None:
            self._trainer = Trainer(self.cfg, self.model, self.variables,
                                    mesh=self.mesh)
        return self._trainer

    def evaluate(self, dataloader_factory, batch_size: Optional[int] = None
                 ) -> Dict[str, float]:
        """Full test-set evaluation (reference model_server.py:72-89)."""
        t0 = time.time()
        metrics = self._get_trainer().test(dataloader_factory, batch_size)
        metrics["inference_time"] = time.time() - t0
        self.requests_served += 1
        return metrics

    def chip_inference(self, dataloader: Iterable, out_dir: str) -> Dict[str, Any]:
        """Batched chip inference with threaded writes (reference :91-127)."""
        n, dt = run_chip_inference(
            dataloader, out_dir, self.model, self.variables,
            is_reg_task=bool(self.cfg.get("is_reg_task", False)))
        self.requests_served += 1
        return {"num_chips": n, "inference_time": dt,
                "chips_per_sec": n / dt if dt else 0.0}

    def online_batcher(self, max_batch: int = 64, max_wait_ms: float = 5.0):
        """Lazy dynamic micro-batcher for online (per-request) inference.

        Beyond the reference's surface: concurrent single-chip requests
        coalesce into bucketed device calls (``serve/batching.py``).
        """
        cached = getattr(self, "_batcher", None)
        cfg_key = (max_batch, max_wait_ms)
        if cached is not None and getattr(self, "_batcher_cfg", None) != cfg_key:
            # Different knobs than the cached instance: replace it —
            # silently returning the old one would drop the caller's
            # latency/throughput settings.
            cached.close()
            cached = None
        if cached is None:
            from instageo_tpu.serve.batching import DynamicBatcher
            from instageo_tpu.serve.infer import make_predict_fn

            self._batcher = DynamicBatcher(
                make_predict_fn(self.model, self.variables,
                                is_reg_task=bool(
                                    self.cfg.get("is_reg_task", False))),
                max_batch=max_batch, max_wait_ms=max_wait_ms)
            self._batcher_cfg = cfg_key
        return self._batcher

    def export_artifact(self, path: str, *,
                        batch_size: Optional[int] = None,
                        probabilities: bool = False) -> str:
        """Serialize this server's serving forward to a StableHLO
        artifact (``serve/export.py``): code-free, symbolic-batch unless
        pinned, shaped from the server's dataloader config."""
        from instageo_tpu.serve.export import export_predict

        dl = self.cfg.dataloader
        model, variables = self.model, self.variables
        if getattr(model, "tp_mesh", None) is not None:
            # A multi-device server holds a mesh-carrying model clone
            # (sharding constraints in apply) and mesh-placed weights;
            # exporting those would bake an N-device mesh into the
            # advertised portable single-device artifact. Export an
            # unsharded clone with host-gathered weights instead.
            model = model.clone(tp_mesh=None)
            variables = jax.device_get(variables)
        return export_predict(
            model, variables, path,
            num_bands=int(model.in_chans),
            img_size=int(dl.get("img_size", 224)),
            temporal_dim=int(dl.get("temporal_dim", 1)),
            is_reg_task=bool(self.cfg.get("is_reg_task", False)),
            probabilities=probabilities,
            batch_size=batch_size,
        )

    def close(self) -> None:
        """Stop the batcher worker thread (its bound-method reference
        roots the model weights for the thread's lifetime)."""
        batcher = getattr(self, "_batcher", None)
        if batcher is not None:
            batcher.close()
            self._batcher = None

    def health_check(self) -> Dict[str, Any]:
        """Reference model_server.py:129-141."""
        return {
            "status": "healthy",
            "uptime_s": time.time() - self.start_time,
            "requests_served": self.requests_served,
            "device": self.get_device_info(),
        }

    def get_device_info(self) -> Dict[str, Any]:
        """Reference model_server.py:143-154."""
        dev = jax.devices()[0]
        return {
            "platform": dev.platform,
            "device_kind": getattr(dev, "device_kind", str(dev)),
            "num_devices": jax.device_count(),
            "mesh_shape": dict(zip(self.mesh.axis_names,
                                   self.mesh.devices.shape)),
        }
