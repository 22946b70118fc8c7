"""Thin shim: the real worker moved into the package
(parallel/multihost_worker.py) so ``rs-seg-multihost-rehearse`` can spawn
it; tests keep this path for spawn-by-file compatibility."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rs_image_segmentation_tpu.parallel.multihost_worker import main

if __name__ == "__main__":
    main()
