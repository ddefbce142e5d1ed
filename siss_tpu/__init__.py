"""siss_tpu: TPU-native data-unlearning framework for diffusion models.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of claserken/SISS
("Data Unlearning in Diffusion Models", ICLR 2025): SISS importance-sampled
defensive-mixture unlearning plus baselines (double-forward, EraseDiff,
NegGrad, naive deletion, subscore-Bernoulli), gradient surgery with on-device
scaling-norm clipping, DDPM/DDIM sampling, and the full metrics suite
(FID, Inception Score, membership loss, exact NLL via probability-flow ODE,
SSCD, CLIP-IQA) — all expressed as pure functions under a single jitted
train step, sharded over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
