"""Batched mel-spectrogram pipeline (XLA; librosa- and tf.signal-parity).

The reference computes mel spectrograms per-window on the host through
``librosa.feature.melspectrogram`` wrapped in ``tf.py_function``
(datasets/preprocessing.py:60-101); here the whole batch of audio windows
becomes one jitted computation: framed STFT + |.|^2 + a single mel matmul,
then power clipping and optional dB, all fused by XLA and shardable over the
window axis.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mel import linear_to_mel_weight_matrix, mel_filterbank
from .stft import hann_window, stft

Array = jax.Array


def db_limits_to_power(dbmin: float, dbmax: float) -> Tuple[float, float]:
    """Power clip range from dB limits (preprocessing.py:94-95)."""
    return (float(np.exp(dbmin * np.log(10.0) / 10.0)),
            float(np.exp(dbmax * np.log(10.0) / 10.0)))


@functools.partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length",
                                             "n_mels", "fmin", "fmax",
                                             "dbmin", "dbmax", "use_dB",
                                             "clip"))
def melspectrogram(audio: Array, sr: int = 16000, n_fft: int = 2048,
                   hop_length: int = 512, n_mels: int = 96,
                   fmin: float = 125.0, fmax: float = 7600.0,
                   dbmin: float = -100.0, dbmax: float = 20.0,
                   use_dB: bool = False, clip: bool = True) -> Array:
    """librosa-parity mel spectrogram for batched windows.

    Args:
        audio: ``[..., T]`` audio windows.
        clip: clip power to the range implied by ``[dbmin, dbmax]``
            before the optional dB transform — the reference
            training-data transform (preprocessing.py:94-99). Pass
            ``False`` for the raw (unclipped) mel power, which the
            separation input path needs to reproduce
            ``librosa.power_to_db``'s per-window ``top_db`` floor
            (see :func:`power_to_db`).
    Returns:
        ``[..., n_mels, n_frames]`` power or dB (``10*log10``) mel
        spectrogram.
    """
    spec = stft(audio, n_fft=n_fft, hop_length=hop_length)   # [..., bins, F]
    power = jnp.square(jnp.abs(spec))
    mel = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    melspec = jnp.einsum("mb,...bf->...mf", mel, power,
                         precision=jax.lax.Precision.HIGHEST)
    if clip:
        pmin, pmax = db_limits_to_power(dbmin, dbmax)
        melspec = jnp.clip(melspec, pmin, pmax)
    if use_dB:
        melspec = 10.0 * jnp.log10(jnp.maximum(melspec, 1e-10))
    return melspec


@functools.partial(jax.jit, static_argnames=("sr", "frame_length", "n_fft",
                                             "hop_length", "n_mels"))
def melspectrogram_tf_signal(audio: Array, sr: int, frame_length: int,
                             n_fft: int = 2048, hop_length: int = 512,
                             n_mels: int = 128) -> Array:
    """tf.signal-path mel spectrogram (preprocessing.py:104-125): frame-major
    layout ``[..., n_frames, n_mels]``, HTK mel over [0, sr/2], pad_end
    framing, un-centred."""
    T = audio.shape[-1]
    # tf.signal.stft(pad_end=True): frames = ceil(T / hop)
    n_frames = -(-T // hop_length)
    pad = max(0, (n_frames - 1) * hop_length + frame_length - T)
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    frames = x[..., idx] * hann_window(frame_length, dtype=x.dtype)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)            # [..., F, bins]
    power = jnp.square(jnp.abs(spec)).astype(jnp.float32)
    A = jnp.asarray(linear_to_mel_weight_matrix(
        n_mels, n_fft // 2 + 1, sr, 0.0, sr / 2.0))
    return jnp.einsum("...fb,bm->...fm", power, A,
                      precision=jax.lax.Precision.HIGHEST)
