#!/usr/bin/env python
"""Entry point: denoiser evaluation (see noisediff_tpu/cli/test_denoising.py)."""
from noisediff_tpu.cli.test_denoising import main

if __name__ == "__main__":
    main()
