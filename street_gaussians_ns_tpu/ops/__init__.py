"""Differentiable render ops: projection, binning, tile rasterization kernels."""
