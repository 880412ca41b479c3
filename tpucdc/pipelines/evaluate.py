"""The ``evaluate`` pipeline verb (SURVEY.md §1.2 L6).

Thin façade over tpucdc.eval.harness so the four pipeline verbs —
train / compress / decompress / evaluate — all live under tpucdc.pipelines
(compress/decompress are methods on codec_runtime.CodecRuntime).
"""

from tpucdc.eval.harness import (EvalOptions, aggregate, evaluate_dataset,
                                 evaluate_image, rd_sweep,
                                 step_guidance_sweep, time_decode)

__all__ = ["EvalOptions", "aggregate", "evaluate_dataset", "evaluate_image",
           "rd_sweep", "step_guidance_sweep", "time_decode"]
