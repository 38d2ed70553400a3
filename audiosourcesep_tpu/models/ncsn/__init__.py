from .refinenet import RefineNetDilated, get_score_model
from .utils import get_sigmas, dsm_loss, anneal_langevin_dynamics
from .layers import (InstanceNorm2dPlus, ConditionalInstanceNorm2dPlus,
                     ResidualBlock, CRPBlock, RCUBlock, MSFBlock, RefineBlock)

__all__ = [
    "RefineNetDilated", "get_score_model",
    "get_sigmas", "dsm_loss", "anneal_langevin_dynamics",
    "InstanceNorm2dPlus", "ConditionalInstanceNorm2dPlus", "ResidualBlock",
    "CRPBlock", "RCUBlock", "MSFBlock", "RefineBlock",
]
