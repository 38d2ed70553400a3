"""audiosourcesep_tpu — a TPU-native JAX framework for audio source separation.

A ground-up rebuild of the capabilities of SamArgt/AudioSourceSep (TF2/TFP
research code) as a TPU-first framework:

* deep generative priors over mel-spectrogram patches — Glow / RealNVP /
  Flow++ normalizing flows (``audiosourcesep_tpu.bijectors``,
  ``audiosourcesep_tpu.models``) and NCSN v1/v2 score networks
  (``audiosourcesep_tpu.models.ncsn``);
* BASIS separation (annealed Langevin dynamics constrained by a mixture)
  as a single jitted ``lax.scan`` (``audiosourcesep_tpu.separation``);
* an XLA-native audio front-end — batched STFT, mel filterbanks,
  Griffin-Lim, NNLS mel inversion (``audiosourcesep_tpu.ops``);
* data pipeline with TFRecord-compatible IO (``audiosourcesep_tpu.data``);
* SPMD data parallelism over a ``jax.sharding.Mesh``
  (``audiosourcesep_tpu.parallel``);
* BSS-Eval v4 metrics and oracle systems (``audiosourcesep_tpu.evaluation``).

Everything on the compute path is pure-functional JAX: params are explicit
pytrees, loops are ``lax.scan``, and models compile once under ``jax.jit``.
"""

__version__ = "0.1.0"

# Respect JAX_PLATFORMS even when a site-wide plugin registration has
# already overridden jax.config (this container's sitecustomize registers
# the TPU plugin and resets jax_platforms at interpreter start, which would
# silently ignore e.g. JAX_PLATFORMS=cpu in subprocesses/tests).
import os as _os


def _honor_jax_platforms_env() -> None:
    env = _os.environ.get("JAX_PLATFORMS")
    # only enforce an explicit CPU request (tests / CI subprocesses); the
    # accelerator platform string is plugin-defined and best left alone
    if not env or env.split(",")[0] != "cpu":
        return
    try:
        import jax as _jax
        current = _jax.config.jax_platforms or ""
        if current.split(",")[0] != "cpu":
            _jax.config.update("jax_platforms", env)
    except Exception:
        pass


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (big programs cost minutes through
    remote compile in some environments; verified to work cross-process).
    Opt out with ASR_NO_JAX_CACHE=1."""
    if _os.environ.get("ASR_NO_JAX_CACHE"):
        return
    try:
        import jax as _jax
        cache_dir = _os.environ.get(
            "ASR_JAX_CACHE", _os.path.expanduser("~/.cache/jax_comp"))
        _os.makedirs(cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


_honor_jax_platforms_env()
_enable_compilation_cache()
