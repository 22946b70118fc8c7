#!/usr/bin/env python3
"""Stage 1 entry point (reference scripts/1_preprocessing.py parity)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rs_image_segmentation_tpu.cli.stages import stage1

if __name__ == "__main__":
    stage1()
