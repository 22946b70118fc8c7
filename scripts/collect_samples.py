#!/usr/bin/env python3
"""collect_samples tool entry point (reference modules/collect_samples.py parity)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rs_image_segmentation_tpu.cli.tools_cli import collect_samples_cli

if __name__ == "__main__":
    collect_samples_cli()
