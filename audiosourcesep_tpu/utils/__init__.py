from .hparams import (max_pairwise_distance, technique1_sigma1,
                      technique2_gamma, technique4_epsilon)
from .summary import total_trainable_variables, print_summary
from .profiling import trace, PhaseTimer, annotate

__all__ = ["max_pairwise_distance", "technique1_sigma1", "technique2_gamma",
           "technique4_epsilon", "total_trainable_variables",
           "print_summary", "trace", "PhaseTimer", "annotate"]
