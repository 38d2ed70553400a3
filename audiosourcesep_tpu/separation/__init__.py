from .mixing import mixing_process
from .basis import (BasisConfig, basis_separate, make_stacked_glow_score,
                    make_stacked_ncsn_score, postprocess, preprocess_mixture,
                    stack_pytrees)

__all__ = [
    "mixing_process", "BasisConfig", "basis_separate",
    "make_stacked_glow_score", "make_stacked_ncsn_score", "postprocess",
    "preprocess_mixture", "stack_pytrees",
]
