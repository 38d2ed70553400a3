"""Flow builders — compose preprocessing + flow bijector + prior.

Equivalent of /root/reference/flow_models/flow_builder.py:11-189, minus the
MirroredStrategy scope plumbing: in JAX, replication/sharding is decided at
``jit`` time by the caller (see ``audiosourcesep_tpu.parallel``), so builders
are strategy-free.

Each builder returns ``(model, params)`` where ``model`` is a
:class:`~audiosourcesep_tpu.bijectors.FlowModel` and ``params`` the freshly
initialised pytree (data-dependent ActNorm init from ``minibatch``).
"""

from __future__ import annotations

from typing import Sequence, Tuple

from ..bijectors import (Chain, FlowModel, ImgPreprocessing,
                         IsotropicNormalPrior, LearnableDiagNormalPrior,
                         SpecPreprocessing)
from .glow import GlowMultiScale, make_conv_net_factory
from .realnvp import RealNVP


def _prior(base_shape, learntop: bool):
    return (LearnableDiagNormalPrior(base_shape) if learntop
            else IsotropicNormalPrior(base_shape))


def build_glow(key, minibatch, data_shape: Sequence[int], L: int = 3,
               K: int = 32, n_filters: int = 512, learntop: bool = True,
               data_type: str = "image", use_logit: bool = False,
               alpha: float = 1e-6, minval: float = -100.0,
               maxval: float = 20.0,
               remat: bool = False) -> Tuple[FlowModel, dict]:
    """Glow with L-level multi-scale bijector (reference flow_builder.py:60-146).

    ``data_type='image'`` uses dequantising :class:`ImgPreprocessing`;
    anything else uses :class:`SpecPreprocessing` with ``[minval, maxval]``
    from the spectrogram scale.
    """
    H, W, C = data_shape
    assert H % 2 ** L == 0 and W % 2 ** L == 0, (data_shape, L)
    if data_type == "image":
        prep = ImgPreprocessing(alpha=alpha if use_logit else 0.05,
                                use_logit=use_logit)
    else:
        prep = SpecPreprocessing(minval=minval, maxval=maxval,
                                 alpha=alpha or 1e-10, use_logit=use_logit)
    glow = GlowMultiScale(L, K, make_conv_net_factory(n_filters),
                          remat=remat)
    bijector = Chain([prep, glow], name="glow_flow")
    model = FlowModel(bijector, _prior(glow.base_event_shape(data_shape),
                                       learntop))
    params = model.init(key, minibatch)
    return model, params


def build_realnvp(key, minibatch, data_shape: Sequence[int],
                  n_filters: int = 32, n_blocks: int = 4,
                  learntop: bool = True,
                  alpha: float = 0.05) -> Tuple[FlowModel, dict]:
    """RealNVP two-scale flow (reference flow_builder.py:11-57)."""
    H, W, C = data_shape
    base_shape = (H // 2, W // 2, C * 4)
    bijector = RealNVP(n_filters=n_filters, n_blocks=n_blocks, alpha=alpha)
    model = FlowModel(bijector, _prior(base_shape, learntop))
    params = model.init(key, minibatch)
    return model, params
