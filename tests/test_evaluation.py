"""Evaluation tests: BSS Eval v4 vs the reference implementation, oracles."""

import os
import sys

import numpy as np
import pytest

from audiosourcesep_tpu.evaluation import (IBM, IBM_melspec, IRM,
                                           IRM_melspec, MWF, bss_eval,
                                           bss_eval_images)
from audiosourcesep_tpu.evaluation.bsseval import (_projection_filters,
                                                   _reference_correlations)

REF_DIR = "/root/reference"


def _load_reference_bsseval():
    """Import the reference bsseval as a parity oracle (it predates
    numpy>=1.24, so shim the removed np.float alias)."""
    if not os.path.exists(os.path.join(REF_DIR, "bsseval_v4.py")):
        return None
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    if not hasattr(np.linalg, "linalg"):
        np.linalg.linalg = np.linalg
    sys.path.insert(0, REF_DIR)
    try:
        import bsseval_v4 as ref
        return ref
    except Exception:
        return None
    finally:
        sys.path.pop(0)


REF_BSS = _load_reference_bsseval()


def make_signals(seed=0, nsrc=2, n=3000, nchan=1):
    rng = np.random.RandomState(seed)
    refs = rng.randn(nsrc, n, nchan)
    # estimates: mixtures of filtered refs + noise (non-trivial SIR/SAR)
    ests = np.zeros_like(refs)
    for j in range(nsrc):
        for i in range(nsrc):
            h = rng.randn(16) * (0.8 if i == j else 0.2)
            for c in range(nchan):
                ests[j, :, c] += np.convolve(refs[i, :, c], h, "same")
        ests[j] += 0.05 * rng.randn(n, nchan)
    return refs, ests


class TestGramMatrix:
    def test_matches_direct_construction(self):
        rng = np.random.RandomState(1)
        refs = rng.randn(2, 200, 1)
        L = 8
        G, sf = _reference_correlations(refs, L)
        stems = refs[:, :, 0]
        padded = np.zeros((2, 200 + L - 1))
        padded[:, :200] = stems
        for a in range(2):
            for b in range(2):
                for k in range(L):
                    for l in range(0, L, 3):
                        sa = np.roll(np.concatenate([padded[a],
                                                     np.zeros(L)]), k)
                        sb = np.roll(np.concatenate([padded[b],
                                                     np.zeros(L)]), l)
                        direct = np.dot(sa, sb)
                        np.testing.assert_allclose(G[a, b, k, l], direct,
                                                   rtol=1e-6, atol=1e-6)

    def test_projection_reduces_residual(self):
        rng = np.random.RandomState(2)
        refs = rng.randn(1, 500, 1)
        L = 32
        # estimate = delayed reference: projection must reconstruct it
        est = np.roll(refs[0, :, 0], 5)[:, None]
        G, sf = _reference_correlations(refs, L)
        C = _projection_filters(G, sf, est, L)
        # filter should be ~delta at lag 5
        assert np.argmax(np.abs(C[0, :, 0])) == 5


@pytest.mark.skipif(REF_BSS is None, reason="reference not importable")
class TestAgainstReference:
    def test_whole_signal_images(self):
        refs, ests = make_signals(seed=3)
        ours = bss_eval(refs, ests, window=np.inf, hop=np.inf,
                        compute_permutation=False, filters_len=64)
        theirs = REF_BSS.bss_eval(refs, ests, window=np.inf, hop=np.inf,
                                  compute_permutation=False, filters_len=64)
        for o, t in zip(ours[:4], theirs[:4]):
            np.testing.assert_allclose(o, t, rtol=1e-4, atol=1e-4)

    def test_framewise_with_permutation(self):
        refs, ests = make_signals(seed=4)
        # swap estimates so the permutation search must recover order
        ests_swapped = ests[::-1]
        kw = dict(window=1000, hop=500, compute_permutation=True,
                  filters_len=32, framewise_filters=True)
        ours = bss_eval(refs, ests_swapped, **kw)
        theirs = REF_BSS.bss_eval(refs, ests_swapped, **kw)
        np.testing.assert_array_equal(ours[4], theirs[4])
        for o, t in zip(ours[:4], theirs[:4]):
            np.testing.assert_allclose(o, t, rtol=1e-3, atol=1e-3)

    def test_sources_version(self):
        refs, ests = make_signals(seed=5)
        ours = bss_eval(refs, ests, window=np.inf, hop=np.inf,
                        filters_len=32, bsseval_sources_version=True)
        theirs = REF_BSS.bss_eval(refs, ests, window=np.inf, hop=np.inf,
                                  filters_len=32,
                                  bsseval_sources_version=True)
        # ISR is NaN by definition in sources version
        np.testing.assert_allclose(ours[0], theirs[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(ours[2], theirs[2], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(ours[3], theirs[3], rtol=1e-4, atol=1e-4)

    def test_stereo(self):
        refs, ests = make_signals(seed=6, nchan=2, n=2000)
        kw = dict(window=np.inf, hop=np.inf, filters_len=16)
        ours = bss_eval(refs, ests, **kw)
        theirs = REF_BSS.bss_eval(refs, ests, **kw)
        for o, t in zip(ours[:4], theirs[:4]):
            np.testing.assert_allclose(o, t, rtol=1e-3, atol=1e-3)


class TestSanity:
    def test_perfect_estimate_high_sdr(self):
        rng = np.random.RandomState(7)
        refs = rng.randn(2, 2000, 1)
        sdr, isr, sir, sar, perm = bss_eval(refs, refs.copy(),
                                            window=np.inf, hop=np.inf,
                                            filters_len=16)
        assert np.all(sdr > 100)  # essentially perfect


class TestOracles:
    def test_irm_estimates_sum_to_mixture(self):
        rng = np.random.RandomState(8)
        sources = rng.randn(2, 8000, 1)
        mixture = sources.sum(axis=0)
        est = IRM(mixture, sources)
        np.testing.assert_allclose(est.sum(axis=0), mixture, atol=1e-6)

    def test_ibm_masks_binary_partition(self):
        rng = np.random.RandomState(9)
        sources = rng.randn(2, 8000, 1)
        mixture = sources.sum(axis=0)
        est = IBM(mixture, sources)
        assert est.shape == sources.shape
        assert np.isfinite(est).all()

    def test_mwf_stereo(self):
        rng = np.random.RandomState(10)
        sources = rng.randn(2, 8000, 2)
        mixture = sources.sum(axis=0)
        est = MWF(mixture, sources)
        assert est.shape == sources.shape
        # MWF should reconstruct most of the mixture energy
        err = np.linalg.norm(est.sum(0) - mixture) / np.linalg.norm(mixture)
        assert err < 0.5, err

    def test_melspec_masks(self):
        rng = np.random.RandomState(11)
        sources = np.abs(rng.randn(2, 5, 96, 64))
        mixture = sources.sum(axis=0)
        irm = IRM_melspec(mixture, sources)
        np.testing.assert_allclose(irm.sum(axis=0), mixture, rtol=1e-5)
        ibm = IBM_melspec(mixture, sources)
        assert ((ibm == 0) | (ibm == mixture[None])).all()
