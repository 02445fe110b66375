"""multimodal_mvd_seg_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of JaronTu/Multimodal_MVD_Seg (an nnU-Net v2.1.1 fork for multimodal
MRI segmentation with mutual distillation and topological constraints).

This is a ground-up rebuild, NOT a port: compute runs through jit/pjit-compiled
pure functions over `jax.sharding.Mesh`es, augmentation is fused on-device XLA,
sliding-window inference is a patch-batched scan with Gaussian-weighted
accumulation, and the differentiable persistent-homology kernel is a C++
extension bridged into JAX via `jax.pure_callback` + `jax.custom_vjp`.

Reference parity map lives in each module's docstring (file:line citations into
/root/reference/nnUNet)."""

__version__ = "0.1.0"
