"""Batched XLA STFT / iSTFT matching librosa conventions.

The reference computes STFTs on the host with librosa
(/root/reference/datasets/preprocessing.py:82-92,
data_loader.py:146-152); here the transform is a batched XLA computation:
frame extraction is a gather, the DFT is ``jnp.fft.rfft`` — all fusible,
jittable, and shardable over the batch axis.

Conventions (librosa.stft defaults, which the reference uses):
* window: periodic Hann of length ``win_length`` (default ``n_fft``),
  zero-padded centred to ``n_fft``;
* ``center=True``: input reflect-padded by ``n_fft // 2`` on both sides
  (librosa ``pad_mode='reflect'``);
* frames: ``1 + len(x) // hop`` when centred.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def hann_window_np(win_length: int, periodic: bool = True) -> np.ndarray:
    """Periodic Hann window (scipy.signal.get_window('hann', n, fftbins=True)),
    as float64 numpy (safe to build inside jit traces)."""
    n = win_length + 1 if periodic else win_length
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1)))
    return w[:-1] if periodic else w


def hann_window(win_length: int, periodic: bool = True,
                dtype=jnp.float32) -> Array:
    return jnp.asarray(hann_window_np(win_length, periodic), dtype)


def _pad_center_np(window: np.ndarray, n_fft: int) -> np.ndarray:
    pad = n_fft - window.shape[0]
    lpad = pad // 2
    return np.pad(window, (lpad, pad - lpad))


def frame_signal(x: Array, frame_length: int, hop_length: int) -> Array:
    """Slice ``x[..., T]`` into overlapping frames ``[..., n_frames, frame_length]``."""
    n_frames = 1 + (x.shape[-1] - frame_length) // hop_length
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return x[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "win_length", "center"))
def stft(x: Array, n_fft: int = 2048, hop_length: int = 512,
         win_length: Optional[int] = None, center: bool = True) -> Array:
    """Batched STFT.

    Args:
        x: ``[..., T]`` real signal (any leading batch dims).
    Returns:
        complex ``[..., n_fft//2 + 1, n_frames]`` — frequency-major, matching
        librosa's layout (the reference keeps complex mixture STFTs in this
        layout for phase-reuse inversion, data_loader.py:146-148).
    """
    win_length = win_length or n_fft
    window = jnp.asarray(_pad_center_np(hann_window_np(win_length), n_fft),
                         x.dtype)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
                    mode="reflect")
    frames = frame_signal(x, n_fft, hop_length)        # [..., F, n_fft]
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)                  # [..., bins, F]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "win_length", "center",
                                             "length"))
def istft(spec: Array, n_fft: int = 2048, hop_length: int = 512,
          win_length: Optional[int] = None, center: bool = True,
          length: Optional[int] = None) -> Array:
    """Inverse STFT with NOLA-normalised overlap-add (librosa.istft).

    Args:
        spec: complex ``[..., n_fft//2 + 1, n_frames]``.
    Returns:
        real ``[..., T]``.
    """
    win_length = win_length or n_fft
    w_np = _pad_center_np(hann_window_np(win_length), n_fft)
    window = jnp.asarray(w_np, jnp.float32)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window                            # [..., F, n_fft]

    n_frames = frames.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    # overlap-add via scatter-add of windowed frames
    starts = np.arange(n_frames) * hop_length
    idx = (starts[:, None] + np.arange(n_fft)[None, :]).reshape(-1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape(*batch_shape, -1)
    y = jnp.zeros((*batch_shape, out_len), frames.dtype)
    y = y.at[..., idx].add(flat)

    # NOLA normalisation: sum of squared windows at each sample
    wsq = np.zeros(out_len, np.float64)
    for s in starts:
        wsq[s:s + n_fft] += w_np ** 2
    wsq = np.maximum(wsq, 1e-11)
    y = y / jnp.asarray(wsq, y.dtype)

    if center:
        y = y[..., n_fft // 2: out_len - n_fft // 2]
    if length is not None:
        y = y[..., :length]
        if y.shape[-1] < length:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1)
                        + [(0, length - y.shape[-1])])
    return y
