"""Strip optimizer state from a checkpoint for release.

Counterpart of reference ``tools/misc/publish_model.py``: keeps params +
batch_stats + meta, drops the optax state, re-saves with a content hash
suffix.

Usage: python tools/misc/publish_model.py IN_CKPT OUT_PREFIX
"""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__)))))  # repo root

import argparse
import hashlib
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="checkpoint path prefix (without .orbax)")
    parser.add_argument("out", help="output path prefix")
    args = parser.parse_args()

    from probpose_code_tpu.engine.checkpoint import load_checkpoint, save_checkpoint

    restored = load_checkpoint(args.checkpoint)
    meta = restored.get("meta", {})
    save_checkpoint(
        args.out,
        params=restored["params"],
        batch_stats=restored.get("batch_stats"),
        opt_state=None,
        meta=meta,
    )
    digest = hashlib.sha256(json.dumps(meta, sort_keys=True).encode()).hexdigest()[:8]
    print(f"published {args.out}.orbax (meta hash {digest})")


if __name__ == "__main__":
    main()
