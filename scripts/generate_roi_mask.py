#!/usr/bin/env python3
"""generate_roi_mask tool entry point (reference modules/generate_roi_mask.py parity)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rs_image_segmentation_tpu.cli.tools_cli import generate_roi_mask_cli

if __name__ == "__main__":
    generate_roi_mask_cli()
