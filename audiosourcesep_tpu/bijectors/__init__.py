from .core import Bijector, Chain, Identity, Invert, sum_event
from .basic import (ActNorm, Invertible1x1Conv, Squeeze, ImgPreprocessing,
                    SpecPreprocessing)
from .coupling import (AffineCouplingSplit, AffineCouplingMasked, binary_mask,
                       stacked_masked_couplings)
from .nets import (ShiftAndLogScaleConvNet, ShiftAndLogScaleResNet,
                   ConstantShiftAndLogScale)
from .distribution import (IsotropicNormalPrior, LearnableDiagNormalPrior,
                           FlowModel)

__all__ = [
    "Bijector", "Chain", "Identity", "Invert", "sum_event",
    "ActNorm", "Invertible1x1Conv", "Squeeze", "ImgPreprocessing",
    "SpecPreprocessing",
    "AffineCouplingSplit", "AffineCouplingMasked", "binary_mask",
    "stacked_masked_couplings",
    "ShiftAndLogScaleConvNet", "ShiftAndLogScaleResNet",
    "ConstantShiftAndLogScale",
    "IsotropicNormalPrior", "LearnableDiagNormalPrior", "FlowModel",
]
