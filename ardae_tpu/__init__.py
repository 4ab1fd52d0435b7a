"""ardae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for AR-DAE VAEs.

A from-scratch re-design of the capabilities of lim0606/pytorch-ardae-vae
(AR-DAE: Towards Unbiased Neural Entropy Gradient Estimation, arXiv 2006.05164):
implicit-posterior VAEs whose intractable entropy gradient is estimated with a
conditional amortized-residual denoising autoencoder (CDAE), trained by
alternating denoising-score-matching updates and model updates.

Layout (TPU-first; see SURVEY.md for the reference layer map):
  core/      pure-jnp losses, statistics, energies, annealing, RNG utilities
  nn/        flax.linen primitive layers (MLP, context/FiLM, weight-norm, conv)
  models/    model zoo: Gaussian-posterior VAEs, implicit-posterior VAEs, CDAEs
  ops/       Pallas TPU kernels for the hot inner loops
  parallel/  device-mesh / sharding utilities (pjit data parallelism over ICI)
  train/     jitted joint train step, TrainState, epoch loop, optimizers
  data/      toy generators + (s/d)bMNIST pipelines with on-device binarization
  io/        checkpointing (orbax) and logging
  cli/       argparse drivers mirroring the reference's public flag surface
"""

__version__ = "0.1.0"
