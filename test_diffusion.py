#!/usr/bin/env python
"""Entry point: bulk noise generation (see noisediff_tpu/cli/test_diffusion.py)."""
from noisediff_tpu.cli.test_diffusion import main

if __name__ == "__main__":
    main()
