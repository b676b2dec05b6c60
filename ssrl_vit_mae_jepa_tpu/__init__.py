"""ssrl_vit_mae_jepa_tpu — TPU-native self-supervised representation learning.

A from-scratch JAX / XLA / Pallas framework with the capabilities of the
reference stack ``giolucasd/ssrl-vit-mae-jepa`` (MAE + JEPA pretraining of a
tiny ViT on STL-10, downstream linear probe / partial unfreeze / full
fine-tune, evaluation, visualization, and ablation orchestration), redesigned
TPU-first:

- models are pure-functional flax modules compiled by XLA (MXU-friendly,
  bf16 compute / fp32 params),
- per-sample MAE masking is vectorized argsort + gather/scatter on device,
- input augmentation (random-resized-crop / flip / normalize) is a fused
  on-device jit pipeline instead of host-side CPU transforms,
- scaling is a ``jax.sharding.Mesh`` with batch-axis data parallelism and
  optional tensor-parallel parameter sharding (GSPMD collectives over ICI),
- the attention hot path has a fused Pallas TPU kernel with an XLA fallback.

Reference layer map and behavioral contracts: /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"
