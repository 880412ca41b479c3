"""tpucdc — TPU-native conditional-diffusion image compression.

A brand-new JAX/XLA/Pallas framework with the capabilities of
`ctangerine/Conditional-Diffusion-Model-for-Compression` (the reference snapshot
contains no source code — see SURVEY.md §0; this build follows the derived
blueprint in SURVEY.md §1-§2 and the targets in BASELINE.md).

Layer map (SURVEY.md §1.2):
  L0 runtime/   — mesh, precision policy, PRNG plumbing
  L1 ops/       — Pallas fused kernels + pure-JAX fallbacks, noise schedules
  L2 codec/     — analysis transform, hyperprior, entropy models, quantization
  L3 diffusion/ — conditional UNet (ResBlocks GN+SiLU, attention, conditioning)
  L4 sampling/  — DDPM/DDIM lax.scan samplers, schedule tables in HBM
  L5 entropy/   — host-side C++ rANS range coder + bitstream container
  L6 pipelines/ — train / compress / decompress / evaluate
  L7 data/ eval/— datasets, metrics (PSNR/MS-SSIM/LPIPS/FID), R-D sweeps
  L8 config/cli — typed configs, orbax checkpointing, logging, CLI
"""

__version__ = "0.1.0"
