#!/usr/bin/env python
"""Entry point: diffusion training (see noisediff_tpu/cli/train_diffusion.py)."""
from noisediff_tpu.cli.train_diffusion import main

if __name__ == "__main__":
    main()
