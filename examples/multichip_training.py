"""Multi-chip training walkthrough: DP mesh, ZeRO-1, tensor parallelism.

Runs offline on a virtual 8-device CPU mesh (or a real TPU slice):

    python examples/multichip_training.py /tmp/instageo_multichip

Shows the three sharding modes the framework ships and what each does
to the state layout:

1. pure data parallelism (batch sharded, everything else replicated);
2. + ZeRO-1 (optimizer moments sharded over the data axis);
3. + tensor parallelism (``tpu.tp=2``: transformer matmuls column/row
   sharded over a 2D (data, model) mesh — ``parallel/tp.py``);
4. FSDP/ZeRO-3 (``tpu.fsdp``: the params themselves sharded over the
   data axis — ``parallel/fsdp.py``).

On a multi-host pod the only addition is ``jax.distributed.initialize()``
before building the mesh (see ``parallel/multihost.py``).
"""

from __future__ import annotations

import os
import sys

# Runnable from anywhere without installing the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# An 8-device virtual CPU mesh when no accelerator pool is attached
# (must happen before jax initializes; harmless on a real slice).
if "--real-devices" not in sys.argv:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np


def main(out_dir: str) -> None:
    import json

    from instageo_tpu.configs.config import load_config
    from instageo_tpu.parallel.mesh import mesh_from_config
    from instageo_tpu.train.factory import create_model
    from instageo_tpu.train.trainer import Trainer

    os.makedirs(out_dir, exist_ok=True)
    results = {}
    n = jax.device_count()
    print(f"devices: {n} x {jax.devices()[0].platform}")

    rng = np.random.default_rng(0)
    x = rng.normal(size=(n * 2, 6, 1, 32, 32)).astype(np.float32)
    y = rng.integers(0, 2, size=(n * 2, 32, 32)).astype(np.int32)

    for title, tpu_overrides in [
        ("data parallel", {}),
        ("DP + ZeRO-1", {"tpu.zero1": True}),
        ("DP x TP(2) + ZeRO-1", {"tpu.tp": 2, "tpu.zero1": True}),
        ("FSDP (ZeRO-3)", {"tpu.fsdp": True}),
    ]:
        cfg = load_config("config", overrides={
            "dataloader.img_size": 32,
            "dataloader.bands": [0, 1, 2, 3, 4, 5],
            "model.model_name": "prithvi_eo_tiny",
            "model.load_pretrained_weights": False,
            "train.batch_size": n * 2,
            "train.ignore_index": -1,
            "tpu.precision": "f32",
            **tpu_overrides,
        })
        mesh = mesh_from_config(cfg.get("tpu"))
        model, variables = create_model(cfg)
        trainer = Trainer(cfg, model, variables, mesh=mesh)
        metrics = trainer.run_train_epoch(iter([(x, y)] * 2),
                                          jax.random.PRNGKey(0), n * 2)

        qkv = trainer.state.params["prithvi_encoder"]["blocks_0"][
            "attn"]["qkv"]["kernel"]
        print(f"[{title}] mesh={dict(zip(mesh.axis_names, mesh.devices.shape))} "
              f"loss={metrics['train_loss']:.4f} "
              f"qkv sharding={qkv.sharding.spec}")
        results[title] = {
            "mesh": dict(zip(mesh.axis_names,
                             (int(d) for d in mesh.devices.shape))),
            "train_loss": float(metrics["train_loss"]),
            "qkv_sharding": str(qkv.sharding.spec),
        }

    with open(os.path.join(out_dir, "multichip_results.json"), "w") as fh:
        json.dump(results, fh, indent=2)
    print("multichip walkthrough OK")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(args[0] if args else "/tmp/instageo_multichip")
