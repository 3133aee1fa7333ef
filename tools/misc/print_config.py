"""Print the fully-resolved config (reference ``tools/misc/print_config.py``)."""


import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.dirname(_osp.abspath(__file__)))))  # repo root

import argparse
import pprint

from probpose_code_tpu.config import Config, parse_cfg_option


def main():
    parser = argparse.ArgumentParser(description="Print the merged config")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--cfg-options", nargs="+", default=[], help="dotted overrides key=value")
    args = parser.parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(dict(parse_cfg_option(kv) for kv in args.cfg_options))
    pprint.pprint(dict(cfg), sort_dicts=False)


if __name__ == "__main__":
    main()
