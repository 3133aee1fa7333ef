#!/usr/bin/env python
"""Name-parity alias: the reference ships ``print_config`` under
``tools/analysis_tools/`` (reference ``tools/analysis_tools/print_config.py``);
the implementation lives in ``tools/misc/print_config.py``."""

import os.path as osp
import runpy
import sys

if __name__ == "__main__":
    target = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "misc", "print_config.py")
    sys.argv[0] = target
    runpy.run_path(target, run_name="__main__")
