"""L4 sampling: DDPM/DDIM lax.scan loops, all tables on device (SURVEY.md C15-C16)."""

from tpucdc.sampling.ddpm import ddpm_sample
from tpucdc.sampling.ddim import (ddim_sample,
                                  ddim_sample_blockcached, ddim_step_tables)
from tpucdc.sampling.guidance import make_cfg_eps_fn

__all__ = ["ddpm_sample", "ddim_sample", "ddim_sample_blockcached",
           "ddim_step_tables",
           "make_cfg_eps_fn"]
