"""Data-layer tests: collator framing, WAV decode, feature extraction,
LibriSpeech tree walking, synthetic dataset."""

import os
import wave

import numpy as np
import pytest

from asr_model_tpu.data.audio_io import load_wave, read_wav
from asr_model_tpu.data.collator import collate
from asr_model_tpu.data.dataset import (Repeated, SyntheticDataset,
                                        data_loader, random_split)
from asr_model_tpu.data.features import extract_features, pitch_toks
from asr_model_tpu.data.librispeech import (LibriSpeechDataset,
                                            iter_librispeech_split)
from asr_model_tpu.data.tokenizer import setup_tokenizer

ASSET = os.path.join(os.path.dirname(__file__), "..", "asr_model_tpu",
                     "assets", "tokenizer.json")


@pytest.fixture(scope="module")
def tok():
    return setup_tokenizer(ASSET)


def test_collator_bos_eos_pad_framing():
    feats = [{"labels": [10, 11, 12]}, {"labels": [20]}]
    batch = collate(feats)
    # text_ids: BOS-prefixed, padded to max+1 with 0
    np.testing.assert_array_equal(batch["text_ids"],
                                  [[1, 10, 11, 12], [1, 20, 0, 0]])
    # labels: EOS-suffixed
    np.testing.assert_array_equal(batch["labels"],
                                  [[10, 11, 12, 2], [20, 2, 0, 0]])


def test_collator_feature_padding_and_masks():
    feats = [{"labels": [5], "spectrogram": np.ones((4, 10), np.float32)},
             {"labels": [6], "spectrogram": np.ones((4, 7), np.float32)}]
    batch = collate(feats, with_masks=True, pad_to_multiple=16)
    assert batch["spectrogram"].shape == (2, 4, 16)
    assert batch["spectrogram"][1, 0, 7:].sum() == 0
    assert batch["spectrogram_mask"][1].sum() == 7
    assert batch["text_ids"].shape[1] == 16


def _write_wav(path, data, sr=16000):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((data * 32767).astype("<i2").tobytes())


def test_wav_decode_and_peak_normalize(tmp_path):
    sr = 16000
    t = np.arange(sr // 4) / sr
    sig = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "tone.wav")
    _write_wav(path, sig, sr)
    raw, got_sr = read_wav(path)
    assert got_sr == sr and abs(raw).max() < 0.51
    normed, _ = load_wave(path)
    assert abs(np.abs(normed).max() - 1.0) < 1e-3


def test_extract_features_shapes(tok, tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "a.wav")
    _write_wav(path, sig, sr)
    out = extract_features({"audio": path, "transcription": "HELLO WORLD"},
                           tokenizer=tok, spectrogram=True, pitch=True,
                           waveform=True, phase=True, mels=16)
    assert out["spectrogram"].shape == (16, 101)
    assert out["pitch"].shape == (1, 101)
    assert out["waveform"].shape == (1, 100)
    assert out["phase"].shape == (101,)
    assert len(out["labels"]) > 0


def test_extract_features_dummy_switches(tok, tmp_path):
    sr = 16000
    sig = np.random.RandomState(0).randn(sr // 2).astype(np.float32)
    path = str(tmp_path / "b.wav")
    _write_wav(path, sig / np.abs(sig).max(), sr)
    out = extract_features({"audio": path, "transcription": "X"},
                           tokenizer=tok, spectrogram=True,
                           dummy_audio=True, dummy_text=True)
    assert out["labels"] == [1] * 32


def test_pitch_toks_alignment(tok):
    sr = 16000
    t = np.arange(sr) / sr
    audio = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    labels = list(range(10))
    pt = pitch_toks(audio, sr, labels, 160)
    assert pt.shape == (11,)            # BOS-prepended
    assert np.isfinite(pt).all()


def test_librispeech_tree_walk(tmp_path):
    d = tmp_path / "LibriSpeech" / "dev-clean" / "84" / "121123"
    d.mkdir(parents=True)
    sig = np.zeros(1600, np.float32)
    _write_wav(str(d / "84-121123-0000.wav"), sig)
    _write_wav(str(d / "84-121123-0001.wav"), sig)
    (d / "84-121123.trans.txt").write_text(
        "84-121123-0000 HELLO THERE\n"
        "84-121123-0001 SECOND LINE\n"
        "malformed-line\n")
    exs = list(iter_librispeech_split(str(tmp_path / "LibriSpeech"
                                          / "dev-clean")))
    assert len(exs) == 2
    assert exs[0]["speaker_id"] == 84
    assert exs[0]["chapter_id"] == 121123
    assert exs[0]["text"] == "HELLO THERE"


def test_librispeech_dataset_features(tok, tmp_path):
    d = tmp_path / "LibriSpeech" / "dev-clean" / "1" / "2"
    d.mkdir(parents=True)
    t = np.arange(8000) / 16000
    _write_wav(str(d / "1-2-0000.wav"),
               (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32))
    (d / "1-2.trans.txt").write_text("1-2-0000 TEST UTTERANCE\n")
    ds = LibriSpeechDataset(str(tmp_path / "LibriSpeech" / "dev-clean"),
                            tokenizer=tok,
                            extract_args=dict(spectrogram=True, mels=8),
                            cache=True)
    assert len(ds) == 1
    item = ds[0]
    assert item["spectrogram"].shape[0] == 8
    assert ds[0] is item                  # cache hit


def test_synthetic_dataset_and_split(tok):
    ds = SyntheticDataset(n=5, tokenizer=tok,
                          extract_args=dict(spectrogram=True, mels=8),
                          dur_range=(0.2, 0.3))
    a, b = random_split(ds, 0.8)
    assert len(a) == 4 and len(b) == 1
    batch = next(data_loader(a, batch_size=2))
    assert batch["spectrogram"].shape[0] == 2
    assert len(Repeated(a, batch_size=2)) == 2


def test_prefetcher_yields_all_batches(tok):
    from asr_model_tpu.data.dataset import Prefetcher
    ds = SyntheticDataset(n=4, tokenizer=tok,
                          extract_args=dict(spectrogram=True, mels=8),
                          dur_range=(0.2, 0.3))
    loader = Repeated(ds, batch_size=2)
    direct = list(loader)
    fetched = list(Prefetcher(loader))
    assert len(fetched) == len(direct) == 2
    np.testing.assert_array_equal(fetched[0]["text_ids"],
                                  direct[0]["text_ids"])


def test_quantize_pitch_polar_forms(tok):
    from asr_model_tpu.data.features import quantize_pitch
    pt = np.asarray([-2.0, 0.0, 2.0], np.float32)
    ids = quantize_pitch(pt)
    np.testing.assert_array_equal(ids, [0, 128, 255])
    # polar form: magnitude * e^{i*bin}, returned as (…, 2) real pairs
    mag = np.asarray([1.0, 2.0, 3.0], np.float32)
    z = quantize_pitch(pt, p=mag)
    assert z.shape == (3, 2)
    np.testing.assert_allclose(np.hypot(z[:, 0], z[:, 1]), mag, rtol=1e-5)
