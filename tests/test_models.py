import jax
import numpy as np
import pytest

from lyra_tpu.models.streaming import LyraGanModel, SoundStreamEncoder


@pytest.fixture(scope="module")
def soundstream(model_path):
    return SoundStreamEncoder(model_path)


@pytest.fixture(scope="module")
def lyragan(model_path):
    return LyraGanModel(model_path)


def test_soundstream_shapes(soundstream):
    state = soundstream.init_state(3)
    frames = np.zeros((3, 320), np.float32)
    feats, state2 = soundstream.extract(state, frames)
    assert feats.shape == (3, 64)
    assert jax.tree.structure(state) == jax.tree.structure(state2)


def test_batched_matches_single(soundstream):
    """Every stream in a batch evolves exactly as it would alone."""
    rng = np.random.default_rng(3)
    frames = rng.uniform(-0.5, 0.5, size=(4, 2, 320)).astype(np.float32)

    state = soundstream.init_state(4)
    f0, state = soundstream.extract(state, frames[:, 0])
    f1, state = soundstream.extract(state, frames[:, 1])
    batched = np.stack([np.asarray(f0), np.asarray(f1)], axis=1)  # [4, 2, 64]

    for b in range(4):
        s = soundstream.init_state(1)
        g0, s = soundstream.extract(s, frames[b : b + 1, 0])
        g1, s = soundstream.extract(s, frames[b : b + 1, 1])
        np.testing.assert_allclose(batched[b, 0], np.asarray(g0)[0], atol=1e-4)
        np.testing.assert_allclose(batched[b, 1], np.asarray(g1)[0], atol=1e-4)


def test_lyragan_shapes(lyragan):
    state = lyragan.init_state(2)
    feats = np.zeros((2, 64), np.float32)
    samples, state = lyragan.decode_hop(state, feats)
    assert samples.shape == (2, 320)


def test_reset_rows(soundstream):
    rng = np.random.default_rng(4)
    frames = rng.uniform(-0.5, 0.5, size=(3, 320)).astype(np.float32)
    state = soundstream.init_state(3)
    _, state = soundstream.extract(state, frames)
    # reset stream 1 only
    reset = soundstream.reset_rows(state, np.array([False, True, False]))
    fresh = soundstream.init_state(3)
    for k in state:
        np.testing.assert_array_equal(np.asarray(reset[k][1]), np.asarray(fresh[k][1]))
        np.testing.assert_array_equal(np.asarray(reset[k][0]), np.asarray(state[k][0]))


def test_jit_step(soundstream, lyragan):
    """Full extract→decode hop under one jit."""

    @jax.jit
    def step(es, ds, frames):
        feats, es = soundstream.extract(es, frames)
        samples, ds = lyragan.decode_hop(ds, feats)
        return samples, es, ds

    es, ds = soundstream.init_state(2), lyragan.init_state(2)
    frames = np.zeros((2, 320), np.float32)
    samples, es, ds = step(es, ds, frames)
    assert samples.shape == (2, 320)
