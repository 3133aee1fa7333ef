"""Evaluate a pose model checkpoint on the config's test set.

TPU-native counterpart of the reference ``tools/test.py``:

    python tools/test.py CONFIG CHECKPOINT [--work-dir DIR]
                         [--cfg-options K=V ...]
"""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))  # repo root

import argparse

from probpose_code_tpu.config import Config, parse_cfg_option


def parse_args():
    parser = argparse.ArgumentParser(description="Test a pose estimator")
    parser.add_argument("config")
    parser.add_argument("checkpoint", nargs="?", default=None)
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--cfg-options", nargs="+", default=[], metavar="K=V")
    parser.add_argument("--launcher", choices=["none", "jax", "slurm"], default="none")
    return parser.parse_args()


def main():
    args = parse_args()
    if args.launcher != "none":
        import jax

        jax.distributed.initialize()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(dict(parse_cfg_option(kv) for kv in args.cfg_options))
    if "test_dataloader" in cfg:
        cfg.val_dataloader = cfg.test_dataloader
    if "test_evaluator" in cfg:
        cfg.val_evaluator = cfg.test_evaluator

    from probpose_code_tpu.engine import Runner
    from probpose_code_tpu.engine.checkpoint import load_checkpoint, load_torch_checkpoint

    runner = Runner.from_cfg(cfg)
    runner.model.init()
    if args.checkpoint:
        if args.checkpoint.endswith(".pth"):
            restored = load_torch_checkpoint(args.checkpoint)
            runner.model.variables = restored["variables"]
        else:
            restored = load_checkpoint(args.checkpoint)
            runner.model.variables = {
                "params": restored["params"],
                "batch_stats": restored.get("batch_stats", {}),
            }
    metrics = runner.val()
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
