"""Samplers: scan-fused DDIM (default), PLMS, DPM-Solver++(2M)."""

from ctrlora_tpu.sampling.ddim import (  # noqa: F401
    DDIMConfig, ddim_decode_from, ddim_sample, ddim_stochastic_encode,
)
from ctrlora_tpu.sampling.dpm_solver import dpm_solver_sample  # noqa: F401
from ctrlora_tpu.sampling.plms import plms_sample  # noqa: F401
