"""Typed dataclass config system (SURVEY.md C22).

Plain importable Python values — tests construct them directly; the CLI
applies dot-overrides (``--model.unet.base_channels=64``). The five
BASELINE.json:7-11 eval configs ship as presets (tpucdc.presets).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from tpucdc.codec.transforms import CodecConfig
from tpucdc.diffusion.conditioning import ConditioningConfig
from tpucdc.diffusion.unet import UNetConfig


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    kind: str = "cosine"
    num_steps: int = 1000


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    codec: CodecConfig = CodecConfig()
    cond: ConditioningConfig = ConditioningConfig()
    unet: UNetConfig = UNetConfig()
    schedule: ScheduleConfig = ScheduleConfig()
    # Classifier-free guidance: probability of dropping (zeroing) the latent
    # conditioning per training example, enabling the unconditional branch
    # that decode-time guidance sweeps blend against (BASELINE.json:11).
    cond_dropout_prob: float = 0.1
    # UNet output parameterization: "eps" (noise prediction, the DDPM
    # default), "x0" (direct clean-image prediction), or "residual"
    # (x₀ = x̄ + net output; codec.synthesis only). With the synthesis
    # concat an x0-net can LEARN the identity to x̄, so an undertrained
    # refiner degrades gracefully — ε-error is amplified by (1-ᾱ)/ᾱ in x₀
    # space at high t (measured r2: 27.0 dB mean → 17.7 dB after ε-mode
    # refinement at mse_eps≈0.38). "residual" (r3) makes the identity EXACT
    # by construction: the r3 x0-mode sweep showed the net's absolute x₀
    # reproduction does not survive the train(128²)→eval(384×512) resolution
    # shift (−2.5 dB vs mean decode even at trunc 0.15), while a residual
    # only perturbs around x̄ and its texture delta is resolution-robust.
    prediction: str = "eps"
    # Low-t-biased timestep sampling (r3): with probability t_low_prob a
    # training sample draws t ~ U[0, t_low_frac·T) instead of U[0, T).
    # Truncated-refinement serving (SampleConfig.truncate_frac ≈ 0.15-0.3)
    # only ever evaluates the UNet at t ≤ 0.3·T, so uniform-t training spends
    # ~70 % of refiner gradient steps on noise levels the served decode never
    # visits. 0 = uniform (the r1/r2 behavior).
    t_low_frac: float = 0.0
    t_low_prob: float = 0.0

    def validated(self) -> "ModelConfig":
        """Rewrite the UNet conditioning dims to match the conditioning head."""
        if self.prediction not in ("eps", "x0", "residual"):
            raise ValueError(f"unknown prediction mode {self.prediction!r}")
        if self.prediction == "residual" and not self.codec.synthesis:
            raise ValueError(
                "prediction='residual' refines the synthesis reconstruction "
                "x̄ — it requires codec.synthesis=True")
        if not (0.0 <= self.t_low_prob <= 1.0):
            raise ValueError(f"t_low_prob must be in [0,1]: {self.t_low_prob}")
        if self.t_low_prob > 0.0 and not (0.0 < self.t_low_frac <= 1.0):
            raise ValueError(
                f"t_low_frac must be in (0,1] when t_low_prob > 0: "
                f"{self.t_low_frac}")
        unet = dataclasses.replace(
            self.unet,
            # With a synthesis transform the UNet input is [x_t ‖ x̄].
            in_channels=6 if self.codec.synthesis else 3,
            cond_channels=self.cond.feature_channels,
            cond_token_dim=self.cond.token_dim)
        cond = dataclasses.replace(
            self.cond, latent_factor=self.codec.latent_factor,
            # Emit conditioning features at the UNet's post-patch grid so the
            # concat adds feature_channels (not feature_channels·p²) channels.
            output_stride=self.unet.patch_size)
        return dataclasses.replace(self, unet=unet, cond=cond)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    crop_size: int = 256
    steps: int = 1_000_000
    lr: float = 1e-4
    warmup_steps: int = 5_000
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    ema_decay: float = 0.9999
    # R-D tradeoff: loss = rate_bpp + lambda * distortion (BASELINE.json:9).
    rd_lambda: float = 1.0
    # Variable-rate training: per-quality λ grid (len == codec.num_qualities);
    # empty = single-rate with rd_lambda.
    rd_lambdas: tuple[float, ...] = ()
    # Distortion term: "eps" | "x0" | "both" (SURVEY.md C17).
    distortion: str = "eps"
    # Weight of the diffusion (ε/x₀) terms when codec.synthesis splits them
    # off the λ-weighted R-D distortion (pipelines/train.loss_fn).
    diff_weight: float = 1.0
    # Optional LPIPS(-proxy) perceptual term, always applied to the CLIPPED
    # one-step x₀ prediction (the refiner output) — never to x̄: the r3
    # perception-distortion split keeps g_s MSE-optimal under λ while the
    # refiner absorbs the perceptual objective (pipelines/train.loss_fn).
    # Weights-gated: real VGG taps when TPUCDC_LPIPS_WEIGHTS points at an
    # .npz, otherwise the deterministic random-conv proxy (eval/lpips.py).
    lpips_weight: float = 0.0
    # Quantile-tracking Adam; 1e-3 lagged the moving density in the round-1
    # TPU run (aux grew 351→2645 over 5k steps) — 1e-2 tracks.
    aux_lr: float = 1e-2
    # Optimizer steps per device dispatch (r3): K > 1 runs a lax.scan over K
    # train steps inside one jit call, shipping K batches per RPC. On the
    # axon relay the single step is dispatch-bound (~77 ms RPC around ~2 ms
    # compute for the medium model), so K≈16 multiplies throughput. Logging,
    # checkpointing, and fault injection quantize to K-step boundaries.
    steps_per_dispatch: int = 1
    log_every: int = 100
    checkpoint_every: int = 5_000
    seed: int = 0
    # Debug fault injection: kill the process at this step (SURVEY.md §5.3).
    fault_inject_step: int = -1
    # TrainState placement over the (data, model) mesh: "replicated" or
    # "tensor" (parallel/tp_rules.py — params/EMA/opt moments sharded by
    # output channel over the model axis; XLA inserts the ICI collectives).
    param_sharding: str = "replicated"


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    steps: int = 100
    eta: float = 0.0
    guidance: float = 1.0
    sampler: str = "ddim"           # "ddim" | "ddpm"
    # Deep-block cache refresh period (arXiv 2312.03209): 1 = off; N > 1 runs
    # the full UNet every N-th step and only the shallow levels in between.
    cache_period: int = 1
    # Truncated refinement decode (codec.synthesis only): sampling starts at
    # t_start = round(truncate_frac · (T-1)) from the noised synthesis
    # reconstruction x̄ instead of t = T-1 from pure noise. 0 = full chain.
    truncate_frac: float = 0.0
    # Distortion-perception blend dial (codec.synthesis only; r3/r4 — Yang &
    # Mandt CDC): the served output is x̂ = x̄ + γ·(x_refined − x̄). γ=1 is the
    # pure refined sample, γ=0 the mean decode. The measured per-rate dial
    # (RESULTS.md r4 blend table): γ≈0.5 dominates the mean decode on
    # PSNR+MS-SSIM+LPIPS at λ∈{32,128}; γ=0 is best at λ≥512 pending the
    # crop-192 refiner. Traced in the decode program — no new HLO per γ.
    blend_gamma: float = 1.0


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()
    sample: SampleConfig = SampleConfig()
    workdir: str = "/tmp/tpucdc"

    def validated(self) -> "Config":
        return dataclasses.replace(self, model=self.model.validated())


def apply_overrides(cfg: Any, overrides: dict[str, str]) -> Any:
    """Apply ``{"train.lr": "3e-4", ...}`` dot-overrides to a dataclass tree."""
    for key, raw in overrides.items():
        parts = key.split(".")
        cfg = _set_path(cfg, parts, raw)
    return cfg


def _set_path(node, parts, raw):
    field_name = parts[0]
    if not dataclasses.is_dataclass(node):
        raise TypeError(f"cannot override into non-dataclass {type(node)}")
    fields = {f.name: f for f in dataclasses.fields(node)}
    if field_name not in fields:
        raise KeyError(f"no config field {field_name!r} on {type(node).__name__}")
    current = getattr(node, field_name)
    if len(parts) > 1:
        new_val = _set_path(current, parts[1:], raw)
    else:
        new_val = _coerce(raw, current)
    return dataclasses.replace(node, **{field_name: new_val})


def _coerce(raw: str, current):
    if isinstance(current, bool):
        return raw.lower() in ("1", "true", "yes")
    if isinstance(current, int):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, tuple):
        if current:
            elem_t = type(current[0])
            return tuple(elem_t(v) for v in raw.split(",") if v)
        # Empty default (e.g. train.rd_lambdas): infer per element — int if
        # it parses, else float, else str (ADVICE r1: int() on "0.25" crashed).
        return tuple(_coerce_scalar(v) for v in raw.split(",") if v)
    return raw


def _coerce_scalar(v: str):
    for t in (int, float):
        try:
            return t(v)
        except ValueError:
            continue
    return v
