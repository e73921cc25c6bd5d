"""CLI training entry point.

``python -m neurosync_trainer_lite_tpu.train [--flag value ...]`` is the
equivalent of the reference's ``python train.py`` (reference: train.py:61-104)
with two upgrades the reference lacks: every Config field is overridable from
the command line, and ``--profile`` captures a jax.profiler trace of the first
training steps (SURVEY.md §5.1 — the reference has no tracing at all).

Device selection needs no CUDA_VISIBLE_DEVICES dance (train.py:62): the mesh
uses every visible chip unless --dp/--tp say otherwise.
"""

from __future__ import annotations

import argparse
import dataclasses

from neurosync_trainer_lite_tpu.config import Config


def _add_config_flags(parser: argparse.ArgumentParser) -> None:
    for f in dataclasses.fields(Config):
        if f.name == "ffmpeg_path":
            parser.add_argument("--ffmpeg_path", type=str, default=None)
            continue
        if f.type in ("bool", bool):
            parser.add_argument(f"--{f.name}", type=lambda s: s.lower() in
                                ("1", "true", "yes"), default=None,
                                metavar="BOOL")
        elif f.type in ("int", int):
            parser.add_argument(f"--{f.name}", type=int, default=None)
        elif f.type in ("float", float):
            parser.add_argument(f"--{f.name}", type=float, default=None)
        else:
            parser.add_argument(f"--{f.name}", type=str, default=None)


def parse_config(argv=None) -> tuple[Config, argparse.Namespace]:
    parser = argparse.ArgumentParser(
        prog="neurosync_trainer_lite_tpu.train",
        description="TPU-native NeuroSync audio→blendshape trainer")
    _add_config_flags(parser)
    parser.add_argument("--tiny", action="store_true",
                        help="use the CPU-runnable 4-layer tiny config as base")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the first steps")
    parser.add_argument("--platform", type=str, default=None,
                        choices=("cpu", "tpu"),
                        help="force a JAX backend (e.g. cpu for a smoke run)")
    parser.add_argument("--init_from_pth", type=str, default=None,
                        metavar="PATH",
                        help="warm-start from a reference-format model.pth "
                             "(weights only; optimizer starts fresh)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize() with "
                             "TPU-pod auto-detection")
    parser.add_argument("--coordinator", type=str, default=None,
                        metavar="HOST:PORT",
                        help="multi-host: coordinator address (explicit mode)")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="multi-host: total process count")
    parser.add_argument("--process_id", type=int, default=None,
                        help="multi-host: this process's rank")
    args = parser.parse_args(argv)
    return config_from_args(args), args


def config_from_args(args: argparse.Namespace) -> Config:
    """Merge parsed `_add_config_flags` values over the (tiny) base config."""
    base = {}
    if getattr(args, "tiny", False):
        from neurosync_trainer_lite_tpu.config import tiny_config
        base = tiny_config().to_dict()
    base.update({
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(Config)
        if getattr(args, f.name, None) is not None
    })
    return Config.from_dict(base)


def main(argv=None) -> None:
    cfg, args = parse_config(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from neurosync_trainer_lite_tpu.utils.compilation_cache import (
        enable_persistent_cache)

    enable_persistent_cache()

    rank_flags = (args.num_processes is not None
                  or args.process_id is not None)
    if args.coordinator is not None:
        from neurosync_trainer_lite_tpu.parallel.distributed import (
            initialize_distributed)
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
    elif args.distributed:
        if rank_flags:
            raise SystemExit(
                "--distributed uses TPU-pod auto-detection and ignores "
                "explicit topology; pass --coordinator HOST:PORT together "
                "with --num_processes/--process_id for explicit mode")
        jax.distributed.initialize()  # TPU-pod auto-detection
    elif rank_flags:
        raise SystemExit(
            "--num_processes/--process_id need --coordinator HOST:PORT "
            "(or use --distributed for TPU-pod auto-detection); refusing to "
            "run silently single-process")
    if args.coordinator is not None or args.distributed:
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    from neurosync_trainer_lite_tpu.training.loop import train_model

    init_params = None
    if args.init_from_pth:
        from neurosync_trainer_lite_tpu.utils.torch_interop import (
            load_torch_model)
        init_params = load_torch_model(args.init_from_pth, cfg)
        print(f"warm-starting from {args.init_from_pth}")

    if args.profile:
        with jax.profiler.trace(args.profile):
            train_model(cfg.replace(n_epochs=min(cfg.n_epochs, 1)),
                        init_params=init_params)
        print(f"profiler trace written to {args.profile}")
        return
    train_model(cfg, init_params=init_params)


if __name__ == "__main__":
    main()
