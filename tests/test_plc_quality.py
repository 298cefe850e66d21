"""Pinned PLC concealment-quality regression test.

Freezes the measured envelope from benchmarks/plc_estimator_eval.py (round 3,
PARITY.md "PLC feature-estimator choice"): 6 s of real speech through the
DecoderEngine under deterministic Gilbert burst loss (20% rate, burst 2.0,
fixed seed), scoring per-hop LSD of lossy-decoded vs clean-decoded audio over
the concealment window (4 hops from each loss).  Clean-decoded — not the
input — is the oracle, so only concealment quality is measured, not codec
quality.  The reference has no direct analog (its integration test runs
loss-free); the closest oracle is the decoder state-machine test's expectation
that concealment output stays continuous (reference:
lyra/lyra_decoder_test.cc:185-340, lyra/lyra_decoder.cc:228-315).

Measured values (round 4, zero estimator): sample1 mean 0.639 / max 3.88,
sample2 mean 0.569 / max 2.46; thresholds carry ~40% mean headroom so runs
can't flake,
while a real concealment regression (e.g. a broken feature estimator or a
fade-machine bug) blows through them.
"""

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.codec.engine import DecoderEngine, EncoderEngine
from lyra_tpu.dsp import melspec
from lyra_tpu.dsp import utils as dsp_utils
from lyra_tpu.tools.packet_loss import GilbertModel
from lyra_tpu.utils import wav

WARMUP_HOPS = 5
CONCEAL_WINDOW_HOPS = 4


def _concealment_lsd(model_path, testdata_path, sample):
    data = wav.read_wav_int16(f"{testdata_path}/{sample}_16kHz.wav")
    hop = config.num_samples_per_hop(16000)
    num_hops = min(6 * config.FRAME_RATE, len(data.samples) // hop)
    x = data.samples[: num_hops * hop].reshape(num_hops, hop).astype(np.float32)

    enc = EncoderEngine(16000, model_path)
    es = enc.init_state(1)
    nq = np.full(1, 120 // config.BITS_PER_QUANTIZER, np.int32)
    all_idx = []
    for t in range(num_hops):
        idx, _, es = enc.step(es, x[t][None], nq)
        all_idx.append(np.asarray(idx))

    gm = GilbertModel.create(packet_loss_rate=0.2, average_burst_length=2.0)
    lost = np.array([not gm.is_packet_received() for _ in range(num_hops)])
    assert lost.sum() > num_hops // 10  # the pattern must actually lose hops

    window = np.zeros(num_hops, bool)
    for t in np.flatnonzero(lost):
        window[t: t + CONCEAL_WINDOW_HOPS] = True
    window[:WARMUP_HOPS] = False

    def decode(with_loss):
        dec = DecoderEngine(16000, model_path, feature_estimator="zero")
        ds = dec.init_state(1)
        outs = []
        for t in range(num_hops):
            rec = np.array([not (with_loss and lost[t])])
            out, _, ds = dec.step(ds, all_idx[t], rec)
            outs.append(np.asarray(out)[0])
        return np.stack(outs)

    clean = decode(with_loss=False)
    lossy = decode(with_loss=True)
    eref = melspec.LogMelExtractorRef(
        melspec.MelConfig.for_rate(16000, config.NUM_FEATURES))
    edec = melspec.LogMelExtractorRef(
        melspec.MelConfig.for_rate(16000, config.NUM_FEATURES))
    lsds = []
    for t in range(num_hops):
        fc = eref.extract(clean[t])
        fd = edec.extract(lossy[t])
        if window[t]:
            lsds.append(dsp_utils.log_spectral_distance(fc, fd))
    return np.asarray(lsds)


@pytest.mark.parametrize("sample,mean_bar,max_bar", [
    ("sample1", 0.90, 5.0),
    ("sample2", 0.90, 5.0),
])
def test_plc_concealment_window_lsd_pinned(model_path, testdata_path,
                                           sample, mean_bar, max_bar):
    lsd = _concealment_lsd(model_path, testdata_path, sample)
    assert lsd.mean() < mean_bar, (
        f"{sample} concealment mean LSD regressed: {lsd.mean():.3f}")
    assert lsd.max() < max_bar, (
        f"{sample} concealment max LSD regressed: {lsd.max():.3f}")
