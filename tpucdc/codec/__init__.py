"""L2 transform-coding models (SURVEY.md C8-C11)."""

from tpucdc.codec.transforms import (AnalysisTransform, HyperAnalysis,
                                     HyperSynthesis, SynthesisTransform,
                                     CodecConfig)
from tpucdc.codec.entropy_models import FactorizedPrior, GaussianConditional
from tpucdc.codec.quantization import additive_noise, ste_round, quantize_dequantize

__all__ = [
    "AnalysisTransform", "HyperAnalysis", "HyperSynthesis",
    "SynthesisTransform", "CodecConfig",
    "FactorizedPrior", "GaussianConditional",
    "additive_noise", "ste_round", "quantize_dequantize",
]
