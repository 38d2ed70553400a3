from .glow import GlowMultiScale, glow_step, glow_block, make_conv_net_factory
from .realnvp import RealNVP
from .flow_builder import build_glow, build_realnvp
from .flowpp import (FlowppCouplingLayer, FlowppBlock, FlowppCifar10,
                     VariationalDequant, build_flowpp)

__all__ = ["GlowMultiScale", "glow_step", "glow_block",
           "make_conv_net_factory", "RealNVP", "build_glow", "build_realnvp",
           "FlowppCouplingLayer", "FlowppBlock", "FlowppCifar10",
           "VariationalDequant", "build_flowpp"]
