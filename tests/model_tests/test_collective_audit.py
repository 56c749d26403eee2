"""Compiled-collective audit (VERDICT r3 #5): the GSPMD collective
schedule of every parallel mode, asserted from the compiled HLO on the
8-device CPU mesh — so a sharding-rule regression fails CI with a
schedule diff, not just "loss stays finite".

What each mode must compile to (verified by hand once, now pinned):

* **DP / ZeRO-1** — gradient sync only: all-reduce(s), and NO
  all-gathers / collective-permutes / all-to-alls anywhere (a stray
  gather means a param or activation got a sharding GSPMD had to undo).
* **TP (Megatron)** — the forward is exactly 2 all-reduces per block
  (after attention's output projection and after fc2 — parallel/tp.py
  docstring), and ZERO resharding collectives: the head-structured qkv
  kernel layout (D, 3, H, Dh) keeps the head shard aligned through
  slice→softmax→merge, which is precisely the property the round-2 flat
  layout broke (involuntary rematerialization + gathers).
* **TP+SP (sequence parallelism)** — all-gathers appear (sequence
  gathered before each block's matmuls) by design.
* **FSDP/ZeRO-3** — params all-gathered at use; grads synchronized by
  reduce-scatter or all-reduce (XLA:CPU lowers reduce-scatter to
  all-reduce+slice, so the pin accepts either form).
* **PP (GPipe)** — stage-boundary collective-permutes (shard_map
  ppermute), no all-to-alls.

Exact op counts are also pinned where they are semantically derivable
(2·depth for the TP forward). Totals for fwd+bwd programs are asserted
as invariants, not exact counts — XLA's all-reduce combiner may merge
ops across versions, which is benign; the INVARIANTS (which collective
kinds may appear at all) are the regression canary.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instageo_tpu.configs.config import load_config
from instageo_tpu.parallel.mesh import mesh_from_config
from instageo_tpu.train.factory import create_model
from instageo_tpu.train.trainer import EpochMetrics, Trainer

BASE = {
    "dataloader.img_size": 32,
    "dataloader.bands": [0, 1, 2, 3, 4, 5],
    "model.model_name": "prithvi_eo_tiny",  # depth=4 (registry.py)
    "model.load_pretrained_weights": False,
    "train.batch_size": 8,
    "train.ignore_index": -1,
    "tpu.precision": "f32",
}
DEPTH = 4

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
               "collective-permute")


def _collective_counts(hlo_text: str) -> dict:
    """Count collective ops (sync + -start async forms) in compiled HLO."""
    return {c: len(re.findall(rf"= \S+ {c}(?:-start)?\(", hlo_text))
            for c in COLLECTIVES}


def _trainer_for(extra: dict) -> Trainer:
    cfg = load_config("config", overrides={**BASE, **extra})
    model, variables = create_model(cfg)
    return Trainer(cfg, model, variables,
                   mesh=mesh_from_config(cfg.get("tpu")))


def _train_step_counts(trainer: Trainer) -> dict:
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 6, 1, 32, 32)).astype(np.float32)
    y = rng.integers(0, 2, size=(8, 32, 32)).astype(np.int32)
    args = trainer._prepare(x, y, 8)
    lowered = trainer._train_step.lower(
        trainer.state, *args, jax.random.PRNGKey(0), EpochMetrics.empty(2))
    return _collective_counts(lowered.compile().as_text())


def test_dp_schedule_is_gradient_allreduce_only():
    c = _train_step_counts(_trainer_for({}))
    assert c["all-reduce"] >= 1, c  # grad sync must exist
    # No resharding of any kind in pure DP.
    assert c["all-gather"] == 0, c
    assert c["collective-permute"] == 0, c
    assert c["all-to-all"] == 0, c


def test_zero1_schedule_adds_no_resharding():
    """ZeRO-1 shards only the OPTIMIZER state; the train step's
    collective schedule must look like plain DP (the state sharding is
    carried by in/out shardings, not runtime collectives)."""
    c = _train_step_counts(_trainer_for({"tpu.zero1": True}))
    assert c["all-reduce"] >= 1, c
    assert c["all-gather"] == 0, c
    assert c["collective-permute"] == 0, c
    assert c["all-to-all"] == 0, c


def test_tp_forward_exactly_two_allreduces_per_block():
    """The Megatron invariant, pinned exactly: one all-reduce after the
    attention output projection + one after fc2, per block — and zero
    gathers/permutes (the qkv head-structured layout keeps every
    intermediate aligned; parallel/tp.py)."""
    trainer = _trainer_for({"tpu.tp": 2, "tpu.zero1": True})
    vs = {"params": trainer.state.params,
          "batch_stats": trainer.state.batch_stats}
    x = jnp.zeros((8, 6, 1, 32, 32), jnp.float32)
    fwd = jax.jit(lambda vs, x: trainer.model.apply(vs, x, train=False))
    c = _collective_counts(fwd.lower(vs, x).compile().as_text())
    assert c["all-reduce"] == 2 * DEPTH, c
    assert c["all-gather"] == 0, c
    assert c["collective-permute"] == 0, c
    assert c["all-to-all"] == 0, c


def test_tp_train_step_schedule():
    """Full fwd+bwd+optimizer under TP2xDP4: all-reduces only (Megatron
    fwd pairs + their backward duals + grad sync). Any all-gather or
    permute means GSPMD had to undo a misaligned sharding — the exact
    regression signature of the round-2 flat qkv layout."""
    c = _train_step_counts(_trainer_for({"tpu.tp": 2, "tpu.zero1": True}))
    # 2/block fwd (=8) + backward duals + grad sync; combiner may merge.
    assert c["all-reduce"] >= 2 * DEPTH + 1, c
    assert c["all-gather"] == 0, c
    assert c["collective-permute"] == 0, c
    assert c["all-to-all"] == 0, c


def test_sp_train_step_gathers_sequence():
    """Megatron-SP: activations are sequence-sharded between blocks, so
    all-gathers (sequence re-gather at each block's matmuls) MUST appear
    — their absence would mean SP silently degraded to plain TP."""
    c = _train_step_counts(_trainer_for(
        {"tpu.tp": 2, "tpu.zero1": True, "tpu.sp": True}))
    assert c["all-reduce"] >= 2 * DEPTH + 1, c
    assert c["all-gather"] > 0, c
    assert c["all-to-all"] == 0, c


def test_fsdp_train_step_gathers_params_and_reduces_grads():
    """ZeRO-3: every sharded param is all-gathered at use (fwd and again
    in the bwd), grads are synchronized by reduce-scatter or all-reduce
    (XLA:CPU lowers reduce-scatter as all-reduce + slice, so either op
    satisfies the grad-sync pin)."""
    c = _train_step_counts(_trainer_for(
        {"tpu.fsdp": True, "tpu.zero1": True}))
    # Far more gathers than blocks: one per sharded param per use.
    assert c["all-gather"] >= 2 * DEPTH, c
    assert c["all-reduce"] + c["reduce-scatter"] >= 1, c
    assert c["all-to-all"] == 0, c
    assert c["collective-permute"] == 0, c


def test_pp_train_step_permutes_between_stages():
    """GPipe over 4 stages: stage boundaries are shard_map ppermutes
    (compiled to collective-permute); nothing else may reshard."""
    c = _train_step_counts(_trainer_for({"tpu.pp": 4}))
    assert c["collective-permute"] >= 1, c
    assert c["all-to-all"] == 0, c
    assert c["all-gather"] == 0, c
