"""msid_tpu — TPU-native multi-spectral satellite image denoising framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ajammoussi/Multi-Spectral-Satellite-Image-Denoising (PyTorch/CUDA reference):
restoration of corrupted 13-band Sentinel-2 (EuroSAT-MS) imagery with a
SatMAE ViT-Base encoder + progressive-upsampling CNN decoder.

Design stance (TPU-first, not a port):
  * NHWC tensor layout everywhere on device (TPU conv-friendly).
  * bf16 compute / fp32 params & optimizer state (no loss scaling needed).
  * Sensor-noise corruption + 64->192 resize run **on device** inside the
    jitted train step (fused XLA ops + Pallas kernels), not in host workers.
  * Metrics (PSNR/SSIM/SAM/RMSE/MAE) are batched on-device reductions —
    one host transfer per epoch, never per sample.
  * Data parallelism via `jax.sharding.Mesh` + explicit shardings; XLA
    emits the gradient all-reduce over ICI.
  * Checkpointing via Orbax with top-K retention.
  * Deployment via `jax.export` (StableHLO) + AOT-compiled inference
    sessions in place of the reference's ONNX path.
"""

__version__ = "0.1.0"

from msid_tpu.utils.config import load_config, merge_configs, save_config, validate_config

__all__ = [
    "__version__",
    "load_config",
    "merge_configs",
    "save_config",
    "validate_config",
]
