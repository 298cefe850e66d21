"""Batched offline transcode: many files through one engine step.

Oracle: the per-file single-stream CLI drivers (cli_lib) — batching files
must not change any file's bytes or samples (row independence), and mixed
lengths must come back trimmed to their own length.
"""

import numpy as np
import pytest

from lyra_tpu import config
from lyra_tpu.tools import batch_transcode, cli_lib
from lyra_tpu.utils import wav

BITRATE = 3200
HOPS = 12  # keep CPU runtime small


@pytest.fixture(scope="module")
def waves(testdata_path):
    hop = config.num_samples_per_hop(16000)
    s1 = wav.read_wav_int16(f"{testdata_path}/sample1_16kHz.wav").samples
    s2 = wav.read_wav_int16(f"{testdata_path}/sample2_16kHz.wav").samples
    # Different lengths on purpose (plus a deliberate partial trailing hop).
    return [s1[: HOPS * hop], s2[: (HOPS - 5) * hop + 7]]


def test_encode_batch_matches_single_stream(model_path, waves):
    batched = batch_transcode.encode_batch(waves, 16000, BITRATE,
                                           model_path=model_path)
    for w, got in zip(waves, batched):
        hop = config.num_samples_per_hop(16000)
        whole = (len(w) // hop) * hop
        ref = cli_lib.encode_wav(w[:whole], 1, 16000, BITRATE,
                                 enable_preprocessing=False,
                                 enable_dtx=False, model_path=model_path)
        assert got == ref  # byte-identical, incl. the shorter file
        assert len(got) == (len(w) // hop) * config.bitrate_to_packet_size(
            BITRATE)


def test_transcode_roundtrip_matches_single_stream(model_path, waves, tmp_path):
    encoded = batch_transcode.encode_batch(waves, 16000, BITRATE,
                                           model_path=model_path)
    decoded = batch_transcode.decode_batch(encoded, 16000, BITRATE,
                                           model_path=model_path, seed=0)
    from lyra_tpu.codec.decoder import LyraDecoder

    for enc_bytes, got in zip(encoded, decoded):
        dec = LyraDecoder(16000, model_path=model_path, seed=0)
        ref = cli_lib.decode_features(
            enc_bytes, config.bitrate_to_packet_size(BITRATE),
            randomize_num_samples_requested=False, decoder=dec)
        assert len(got) == len(ref)
        # Engine vs facade may differ by 1 LSB in the crossfade cos.
        np.testing.assert_allclose(got.astype(int), ref.astype(int), atol=1)


def test_cli_end_to_end(model_path, waves, tmp_path, testdata_path):
    indir = tmp_path / "in"
    indir.mkdir()
    hop = config.num_samples_per_hop(16000)
    for name, w in zip(("a", "b"), waves):
        wav.write_wav_int16(str(indir / f"{name}.wav"), w, 16000, 1)
    outdir = tmp_path / "out"
    rc = batch_transcode.main([
        "--input_glob", str(indir / "*.wav"),
        "--output_dir", str(outdir),
        "--bitrate", str(BITRATE),
        "--mode", "transcode",
        "--model_path", model_path,
    ])
    assert rc == 0
    for name, w in zip(("a", "b"), waves):
        out = wav.read_wav_int16(str(outdir / f"{name}_decoded.wav"))
        assert out.sample_rate_hz == 16000
        assert len(out.samples) == (len(w) // hop) * hop

    # encode mode writes .lyra files sized to whole packets
    rc = batch_transcode.main([
        "--input_glob", str(indir / "*.wav"),
        "--output_dir", str(outdir),
        "--bitrate", str(BITRATE),
        "--mode", "encode",
        "--model_path", model_path,
    ])
    assert rc == 0
    ps = config.bitrate_to_packet_size(BITRATE)
    for name, w in zip(("a", "b"), waves):
        data = (outdir / f"{name}.lyra").read_bytes()
        assert len(data) == (len(w) // hop) * ps

    # decode mode reads them back
    rc = batch_transcode.main([
        "--input_glob", str(outdir / "*.lyra"),
        "--output_dir", str(outdir),
        "--bitrate", str(BITRATE),
        "--mode", "decode",
        "--sample_rate", "16000",
        "--model_path", model_path,
    ])
    assert rc == 0
    assert (outdir / "a_decoded.wav").exists()

    # no matching inputs -> error exit
    assert batch_transcode.main([
        "--input_glob", str(indir / "*.nope"),
        "--output_dir", str(outdir),
    ]) == 1


def test_cli_exit_code_on_unreadable_inputs(tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav at all")
    assert batch_transcode.main([
        "--input_glob", str(tmp_path / "*.wav"),
        "--output_dir", str(tmp_path / "out"),
    ]) == 1


def test_same_stem_inputs_do_not_clobber(tmp_path, testdata_path):
    """data/a/utt.wav and data/b/utt.wav must produce distinct outputs, not
    silently overwrite each other."""
    import shutil

    from lyra_tpu.tools import batch_transcode

    src = f"{testdata_path}/sample1_16kHz.wav"
    for d in ("a", "b"):
        (tmp_path / d).mkdir()
        shutil.copy(src, tmp_path / d / "utt.wav")
    out = tmp_path / "out"
    rc = batch_transcode.main([
        "--input_glob", str(tmp_path / "*" / "utt.wav"),
        "--output_dir", str(out), "--mode", "encode"])
    assert rc == 0
    produced = sorted(p.name for p in out.glob("*.lyra"))
    assert len(produced) == 2 and len(set(produced)) == 2, produced
    assert {"a_utt.lyra", "b_utt.lyra"} == set(produced)
