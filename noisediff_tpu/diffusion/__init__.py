from .gaussian import GaussianDiffusion
