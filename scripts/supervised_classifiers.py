#!/usr/bin/env python3
"""supervised_classifiers tool entry point (reference modules/supervised_classifiers.py parity)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from rs_image_segmentation_tpu.cli.tools_cli import supervised_cli

if __name__ == "__main__":
    supervised_cli()
