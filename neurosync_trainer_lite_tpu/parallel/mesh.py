"""Device mesh and sharding rules.

This is the framework's communication backend — the TPU-native replacement
for the reference's hand-rolled replicated-GPU loop (reference:
utils/training_utils.py:131-303, which copies every gradient tensor to
device 0 in a Python loop, averages, then copies parameters back per step).
Here the same synchronous-DP semantics compile to a single XLA program:
the batch is sharded over the 'data' mesh axis, the loss mean induces a
gradient all-reduce over ICI, and parameters update in place — no Python in
the step, no host round-trips.

Mesh axes:
- 'data'  — data parallelism (gradient psum over ICI)
- 'model' — optional tensor parallelism (Megatron-style: attention heads and
  FFN hidden dim sharded; XLA inserts the two all-reduces per block)

The 235M model fits one chip comfortably, so tp=1 is the default; the TP
rules exist for scale-up headroom and are exercised by the multichip dry run.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neurosync_trainer_lite_tpu.config import Config


def make_mesh(cfg: Config, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    tp = max(1, cfg.tp)
    dp = cfg.dp if cfg.dp > 0 else max(1, len(devices) // tp)
    n = dp * tp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("data", "model"))


def _attn_specs(stacked: bool) -> dict:
    """Megatron sharding for one attention block: q/k/v column-parallel
    (heads split over 'model'), out row-parallel."""
    s = (None,) if stacked else ()
    col_w, col_b = P(*s, None, "model"), P(*s, "model")
    row_w, rep_b = P(*s, "model", None), P(*s)
    return {
        "q": {"w": col_w, "b": col_b},
        "k": {"w": col_w, "b": col_b},
        "v": {"w": col_w, "b": col_b},
        "out": {"w": row_w, "b": rep_b},
    }


def _ffn_specs(stacked: bool) -> dict:
    s = (None,) if stacked else ()
    return {
        "linear1": {"w": P(*s, None, "model"), "b": P(*s, "model")},
        "linear2": {"w": P(*s, "model", None), "b": P(*s)},
    }


def _norm_specs(stacked: bool) -> dict:
    s = (None,) if stacked else ()
    return {"scale": P(*s), "bias": P(*s)}


def param_specs(cfg: Config) -> dict:
    """PartitionSpec pytree matching init_seq2seq's structure."""
    rep2 = {"w": P(), "b": P()}
    encoder = {
        "embedding": rep2,
        "layers": {
            "self_attn": _attn_specs(True),
            "ffn": _ffn_specs(True),
            "norm1": _norm_specs(True),
            "norm2": _norm_specs(True),
        },
        "norm": _norm_specs(False),
    }
    decoder = {
        "layers": {
            "self_attn": _attn_specs(True),
            "cross_attn": _attn_specs(True),
            "ffn": _ffn_specs(True),
            "norm1": _norm_specs(True),
            "norm2": _norm_specs(True),
            "norm3": _norm_specs(True),
        },
        "fc_output": rep2,
        "norm": _norm_specs(False),
    }
    return {"encoder": encoder, "decoder": decoder}


def param_shardings(cfg: Config, mesh: Mesh) -> dict:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), param_specs(cfg),
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, T, F] batches sharded over the data axis."""
    return NamedSharding(mesh, P("data", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, cfg: Config, mesh: Mesh):
    """Place a host/param pytree onto the mesh with the TP sharding rules."""
    return jax.device_put(params, param_shardings(cfg, mesh))
