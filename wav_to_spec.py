#!/usr/bin/env python
"""wav -> mel-spectrogram dataset CLI.

Same contract as /root/reference/datasets/wav_to_spec.py:76-105 (flags,
defaults, output layout, out.log) — but spectrograms for all windows of a
file are computed in ONE batched XLA call instead of per-window host
librosa.
"""

import argparse
import os
import re
import time
import warnings

import jax.numpy as jnp
import numpy as np

warnings.filterwarnings("ignore")

from audiosourcesep_tpu.data import save_tf_records
from audiosourcesep_tpu.data.loaders import load_wav
from audiosourcesep_tpu.ops import melspectrogram, melspectrogram_tf_signal


def main(args):
    t0 = time.time()
    input_dirpath = os.path.abspath(args.INPUT)
    output_dirpath = os.path.abspath(args.OUTPUT)
    os.makedirs(output_dirpath, exist_ok=True)

    logfile = open(os.path.join(output_dirpath, "out.log"), "w")
    template = "".join(f"{k} = {v} \n\t " for k, v in vars(args).items())
    print(template)
    logfile.write(template)

    wav_files = []
    for root, _, files in os.walk(input_dirpath):
        wav_files += [os.path.join(root, f) for f in files
                      if re.match(r".*\.wav$", f)]

    hop_sec = (args.length_sec * (1.0 - args.overlap)
               if args.overlap > 0 else None)
    for wav_file in sorted(wav_files):
        windows, rate = load_wav(wav_file, args.length_sec, sr=args.sr,
                                 hop_sec=hop_sec)
        print(f"{wav_file} Loaded...")
        if args.use_signal:
            specs = melspectrogram_tf_signal(
                jnp.asarray(windows), sr=rate,
                frame_length=int(rate * args.length_sec),
                n_fft=args.n_fft, hop_length=args.hop_length,
                n_mels=args.n_mels)
            print("\t Mel Spectrograms computed using tf.signal semantics")
        else:
            specs = melspectrogram(
                jnp.asarray(windows), sr=rate, n_fft=args.n_fft,
                hop_length=args.hop_length, n_mels=args.n_mels,
                fmin=args.fmin, fmax=args.fmax, dbmin=args.dbmin,
                dbmax=args.dbmax, use_dB=args.use_dB)
            print("\t Mel Spectrograms computed using librosa semantics")
        specs = np.asarray(specs)

        filename = os.path.join(output_dirpath,
                                os.path.split(wav_file)[1])[:-4]
        if args.tfrecords:
            save_tf_records(list(specs), filename)
            print(f"\t Saved as tfrecords at {filename}")
        else:
            for i, s in enumerate(specs):
                np.save(f"{filename}_{i}", s)
            print(f"\tSaved into {len(specs)} spectrograms as npy")

    deltaT = np.round(time.time() - t0, 2)
    msg = (f"{len(wav_files)} wav files saved as spectrograms in "
           f"{deltaT} seconds.")
    print("-" * 40)
    print(msg)
    logfile.write(msg)
    logfile.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Compute Mel spectrograms and save them")
    parser.add_argument("INPUT", type=str,
                        help="input dirpath of the wav files")
    parser.add_argument("OUTPUT", type=str,
                        help="output dirpath for saving the spectrograms")
    parser.add_argument("--length_sec", type=float, default=2.04)
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--n_fft", type=int, default=2048)
    parser.add_argument("--hop_length", type=int, default=512)
    parser.add_argument("--n_mels", type=int, default=96)
    parser.add_argument("--fmin", type=int, default=125)
    parser.add_argument("--fmax", type=int, default=7600)
    parser.add_argument("--dbmin", type=int, default=-100)
    parser.add_argument("--dbmax", type=int, default=20)
    parser.add_argument("--use_dB", action="store_true")
    parser.add_argument("--use_signal", action="store_true")
    parser.add_argument("--overlap", type=float, default=0.0,
                        help="fractional window overlap in [0, 1) for data "
                             "augmentation (reference uses 0)")
    parser.add_argument("--tfrecords", action="store_true")
    main(parser.parse_args())
