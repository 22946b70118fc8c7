#!/usr/bin/env python3
"""Tiled large-scene classification entry point."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rs_image_segmentation_tpu.cli.stages import classify_large

if __name__ == "__main__":
    classify_large()
