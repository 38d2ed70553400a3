from .instance_norm import (instance_norm_2dplus,
                            instance_norm_2dplus_reference)

__all__ = ["instance_norm_2dplus", "instance_norm_2dplus_reference"]
