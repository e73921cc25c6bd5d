"""Interchange with the reference PyTorch checkpoint format.

The reference ecosystem (NeuroSync Local API / Player) exchanges weights as a
torch ``state_dict`` saved to ``out/model.pth`` (reference:
utils/model_utils.py:29-49, utils/checkpoint_utils.py:56). This module maps
that flat key space to/from our stacked-layer JAX pytree so users can move
checkpoints in either direction.

Key mapping (reference module names → pytree paths):
  encoder.embedding.{weight,bias}              → encoder/embedding
  encoder.transformer_encoder.{i}.self_attn.{q,k,v,out}_linear
                                               → encoder/layers/self_attn (stacked)
  encoder.transformer_encoder.{i}.ffn.linear{1,2}
                                               → encoder/layers/ffn
  encoder.transformer_encoder.{i}.norm{1,2}    → encoder/layers/norm{1,2}
  encoder.layer_norm                           → encoder/norm
  decoder.transformer_decoder.{i}.self_attn    → decoder/layers/self_attn
  decoder.transformer_decoder.{i}.multihead_attn → decoder/layers/cross_attn
  decoder.transformer_decoder.{i}.ffn/norm{1,2,3}
  decoder.fc_output, decoder.layer_norm

torch Linear stores weight as [out, in] and computes x @ W.T + b; our kernels
are [in, out], so weights are transposed in both directions.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from neurosync_trainer_lite_tpu.config import Config

_ATTN_KEYS = {"q": "q_linear", "k": "k_linear", "v": "v_linear", "out": "out_linear"}


def _layer_prefixes(cfg: Config):
    enc = [f"encoder.transformer_encoder.{i}" for i in range(cfg.n_layers)]
    dec = [f"decoder.transformer_decoder.{i}" for i in range(cfg.n_layers)]
    return enc, dec


def _linear_to_sd(sd, prefix, p, i=None):
    w = np.asarray(p["w"] if i is None else p["w"][i], dtype=np.float32)
    b = np.asarray(p["b"] if i is None else p["b"][i], dtype=np.float32)
    sd[f"{prefix}.weight"] = w.T.copy()
    sd[f"{prefix}.bias"] = b.copy()


def _norm_to_sd(sd, prefix, p, i=None):
    sd[f"{prefix}.weight"] = np.asarray(
        p["scale"] if i is None else p["scale"][i], dtype=np.float32).copy()
    sd[f"{prefix}.bias"] = np.asarray(
        p["bias"] if i is None else p["bias"][i], dtype=np.float32).copy()


def _attn_to_sd(sd, prefix, p, i):
    for ours, theirs in _ATTN_KEYS.items():
        _linear_to_sd(sd, f"{prefix}.{theirs}", p[ours], i)


def params_to_state_dict(params, cfg: Config) -> dict:
    """Our pytree → reference-format state dict of numpy arrays."""
    sd: dict = {}
    enc, dec = _layer_prefixes(cfg)
    e, d = params["encoder"], params["decoder"]

    _linear_to_sd(sd, "encoder.embedding", e["embedding"])
    for i, pre in enumerate(enc):
        _attn_to_sd(sd, f"{pre}.self_attn", e["layers"]["self_attn"], i)
        _linear_to_sd(sd, f"{pre}.ffn.linear1", e["layers"]["ffn"]["linear1"], i)
        _linear_to_sd(sd, f"{pre}.ffn.linear2", e["layers"]["ffn"]["linear2"], i)
        _norm_to_sd(sd, f"{pre}.norm1", e["layers"]["norm1"], i)
        _norm_to_sd(sd, f"{pre}.norm2", e["layers"]["norm2"], i)
    _norm_to_sd(sd, "encoder.layer_norm", e["norm"])

    for i, pre in enumerate(dec):
        _attn_to_sd(sd, f"{pre}.self_attn", d["layers"]["self_attn"], i)
        _attn_to_sd(sd, f"{pre}.multihead_attn", d["layers"]["cross_attn"], i)
        _linear_to_sd(sd, f"{pre}.ffn.linear1", d["layers"]["ffn"]["linear1"], i)
        _linear_to_sd(sd, f"{pre}.ffn.linear2", d["layers"]["ffn"]["linear2"], i)
        _norm_to_sd(sd, f"{pre}.norm1", d["layers"]["norm1"], i)
        _norm_to_sd(sd, f"{pre}.norm2", d["layers"]["norm2"], i)
        _norm_to_sd(sd, f"{pre}.norm3", d["layers"]["norm3"], i)
    _linear_to_sd(sd, "decoder.fc_output", d["fc_output"])
    _norm_to_sd(sd, "decoder.layer_norm", d["norm"])
    return sd


def _sd_linear(sd, prefix, idxs=None):
    if idxs is None:
        return {
            "w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T),
            "b": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
        }
    return {
        "w": jnp.stack([jnp.asarray(np.asarray(sd[f"{p}.weight"]).T) for p in idxs]),
        "b": jnp.stack([jnp.asarray(np.asarray(sd[f"{p}.bias"])) for p in idxs]),
    }


def _sd_norm(sd, prefix, idxs=None):
    if idxs is None:
        return {
            "scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"])),
        }
    return {
        "scale": jnp.stack([jnp.asarray(np.asarray(sd[f"{p}.weight"])) for p in idxs]),
        "bias": jnp.stack([jnp.asarray(np.asarray(sd[f"{p}.bias"])) for p in idxs]),
    }


def _sd_attn(sd, prefixes):
    return {
        ours: _sd_linear(sd, "", [f"{p}.{theirs}" for p in prefixes])
        for ours, theirs in _ATTN_KEYS.items()
    }


def state_dict_to_params(sd: dict, cfg: Config) -> dict:
    """Reference-format state dict → our stacked pytree (fp32)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    enc, dec = _layer_prefixes(cfg)

    encoder = {
        "embedding": _sd_linear(sd, "encoder.embedding"),
        "layers": {
            "self_attn": _sd_attn(sd, [f"{p}.self_attn" for p in enc]),
            "ffn": {
                "linear1": _sd_linear(sd, "", [f"{p}.ffn.linear1" for p in enc]),
                "linear2": _sd_linear(sd, "", [f"{p}.ffn.linear2" for p in enc]),
            },
            "norm1": _sd_norm(sd, "", [f"{p}.norm1" for p in enc]),
            "norm2": _sd_norm(sd, "", [f"{p}.norm2" for p in enc]),
        },
        "norm": _sd_norm(sd, "encoder.layer_norm"),
    }
    decoder = {
        "layers": {
            "self_attn": _sd_attn(sd, [f"{p}.self_attn" for p in dec]),
            "cross_attn": _sd_attn(sd, [f"{p}.multihead_attn" for p in dec]),
            "ffn": {
                "linear1": _sd_linear(sd, "", [f"{p}.ffn.linear1" for p in dec]),
                "linear2": _sd_linear(sd, "", [f"{p}.ffn.linear2" for p in dec]),
            },
            "norm1": _sd_norm(sd, "", [f"{p}.norm1" for p in dec]),
            "norm2": _sd_norm(sd, "", [f"{p}.norm2" for p in dec]),
            "norm3": _sd_norm(sd, "", [f"{p}.norm3" for p in dec]),
        },
        "fc_output": _sd_linear(sd, "decoder.fc_output"),
        "norm": _sd_norm(sd, "decoder.layer_norm"),
    }
    return {"encoder": encoder, "decoder": decoder}


def torch_available() -> bool:
    """True when torch is importable. The .pth interop paths are the ONLY
    torch dependency in the package (pyproject ships it as the [interop]
    extra); callers on default flows (per-epoch export, serve --model) use
    this to degrade loudly instead of crashing a training run or a server
    startup on ModuleNotFoundError."""
    import importlib.util

    return importlib.util.find_spec("torch") is not None


def save_torch_model(params, cfg: Config, path: str) -> None:
    """Write a reference-compatible ``model.pth`` (torch.save of a state dict)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_state_dict(params, cfg).items()}
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(sd, path)


def load_torch_model(path: str, cfg: Config) -> dict:
    """Load a reference ``model.pth`` into our pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return state_dict_to_params(sd, cfg)
