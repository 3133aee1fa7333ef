"""Train a pose model from a config file.

TPU-native counterpart of the reference ``tools/train.py``:

    python tools/train.py CONFIG [--work-dir DIR] [--resume [CKPT]]
                          [--amp] [--auto-scale-lr]
                          [--cfg-options K=V ...]

Distributed: no launcher needed — on a TPU pod slice run the same command
under `jax.distributed` auto-init; the mesh spans all visible devices
(cfg.env_cfg.mesh controls the data/model axis split).
"""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))  # repo root

import argparse
import os.path as osp

from probpose_code_tpu.config import Config, parse_cfg_option


def parse_args():
    parser = argparse.ArgumentParser(description="Train a pose estimator")
    parser.add_argument("config", help="train config file path")
    parser.add_argument("--work-dir", help="the dir to save logs and checkpoints")
    parser.add_argument("--resume", nargs="?", const="auto", default=None,
                        help="resume from checkpoint ('auto' = latest in work dir)")
    parser.add_argument("--amp", action="store_true", help="use bfloat16 compute")
    parser.add_argument("--no-validate", action="store_true")
    parser.add_argument("--auto-scale-lr", action="store_true")
    parser.add_argument("--cfg-options", nargs="+", default=[], metavar="K=V")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--launcher",
        choices=["none", "jax", "slurm"],
        default="none",
        help="multi-host init: 'jax' / 'slurm' call jax.distributed.initialize() "
        "(TPU pods auto-configure; on other platforms set JAX coordinator env vars)",
    )
    return parser.parse_args()


def merge_args(cfg: Config, args) -> Config:
    if args.work_dir:
        cfg.work_dir = args.work_dir
    elif "work_dir" not in cfg:
        cfg.work_dir = osp.join("work_dirs", osp.splitext(osp.basename(args.config))[0])
    if args.resume is not None:
        cfg.resume = True
    if args.amp:
        cfg.model["backbone"]["dtype"] = "bfloat16"
        cfg.model["head"]["dtype"] = "bfloat16"
    if args.auto_scale_lr and "auto_scale_lr" in cfg:
        base = cfg.auto_scale_lr.get("base_batch_size", 512)
        bs = cfg.train_dataloader.get("batch_size", base)
        scale = bs / base
        cfg.optim_wrapper["optimizer"]["lr"] = cfg.optim_wrapper["optimizer"]["lr"] * scale
    cfg.seed = args.seed
    if args.cfg_options:
        cfg.merge_from_dict(dict(parse_cfg_option(kv) for kv in args.cfg_options))
    return cfg


def main():
    args = parse_args()
    if args.launcher != "none":
        # TPU pods auto-discover coordinator/process ids; SLURM and manual
        # launches read the standard env (SLURM_* / JAX_COORDINATOR_ADDRESS,
        # JAX_NUM_PROCESSES, JAX_PROCESS_ID). The mesh then spans every
        # process's devices (DCN between hosts, ICI within).
        import jax

        jax.distributed.initialize()
    cfg = Config.fromfile(args.config)
    cfg = merge_args(cfg, args)

    from probpose_code_tpu.engine import Runner

    runner = Runner.from_cfg(cfg)
    runner.train()


if __name__ == "__main__":
    main()
