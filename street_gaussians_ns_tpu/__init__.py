"""street_gaussians_ns_tpu — a TPU-native Gaussian-splatting framework for dynamic
urban scenes (Street Gaussians), built on JAX / XLA / Pallas / pjit.

Capability parity target: LightwheelAI/street-gaussians-ns (nerfstudio plugin,
CUDA gsplat backend). This package is a standalone framework: data parsing,
differentiable tile rasterization, scene-graph models, training runtime, and
CLIs — all designed TPU-first (fixed shapes, mask-active buffers, MXU-friendly
compositing, shard_map parallelism).
"""

__version__ = "0.1.0"
