"""Samplers: scan-fused DDIM (default), PLMS, DPM-Solver multistep (2M) and
singlestep ("DPM-Solver-fast")."""

from ctrlora_tpu.sampling.ddim import (  # noqa: F401
    DDIMConfig, ddim_decode_from, ddim_sample, ddim_stochastic_encode,
)
from ctrlora_tpu.sampling.dpm_solver import (  # noqa: F401
    dpm_solver_sample, dpm_solver_singlestep_sample,
)
from ctrlora_tpu.sampling.plms import plms_sample  # noqa: F401
