"""Convert a reference PyTorch checkpoint (.pth) into this framework's orbax
format (reference ``tools/pth_transfer.py`` transfers distilled weights).

Usage: python tools/misc/pth_transfer.py CONFIG SRC.pth DST_DIR
"""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__)))))  # repo root

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("src", help="torch .pth checkpoint")
    parser.add_argument("dst", help="output orbax checkpoint directory")
    args = parser.parse_args()

    from probpose_code_tpu.apis import init_model
    from probpose_code_tpu.engine.checkpoint import save_checkpoint

    model = init_model(args.config, checkpoint=args.src)
    save_checkpoint(args.dst, model.variables['params'],
                    batch_stats=model.variables.get('batch_stats'))
    print(f"converted {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
