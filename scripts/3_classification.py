#!/usr/bin/env python3
"""Stage 3 entry point (reference scripts/3_classification.py parity)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rs_image_segmentation_tpu.cli.stages import stage3

if __name__ == "__main__":
    stage3()
