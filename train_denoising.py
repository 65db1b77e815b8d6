#!/usr/bin/env python
"""Entry point: denoiser training (see noisediff_tpu/cli/train_denoising.py)."""
from noisediff_tpu.cli.train_denoising import main

if __name__ == "__main__":
    main()
