#!/usr/bin/env python
"""Name-parity alias for ``topdown_demo_with_det.py``.

The reference names this demo after its mmdet detector dependency
(reference ``demo/topdown_demo_with_mmdet.py``); here detection runs on
the in-framework RTMDet port, so the canonical script is
``topdown_demo_with_det.py``. This alias keeps the reference filename
working verbatim.
"""

from topdown_demo_with_det import main  # noqa: F401

if __name__ == "__main__":
    main()
