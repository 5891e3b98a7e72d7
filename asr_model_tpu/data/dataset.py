"""Datasets and loaders.

Parity targets: prepare_datasets essentials.py:998-1026 (map-style
dataset over metadata.csv with full per-sample feature extraction) and
the synthetic fixtures promoted from the reference's dummy_audio/
dummy_text debug switches (SURVEY §4).  The LibriSpeech OpenSLR builder
lives in data/librispeech.py.

TPU addition: ``data_loader`` yields collated numpy batches with
optional length-bucketed padding (pad_to_multiple) so jit sees few
static shapes, and an optional feature cache (the reference re-extracts
features every epoch, SURVEY §3.1).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from asr_model_tpu.data.collator import collate
from asr_model_tpu.data.features import extract_features


class PreparedDataset:
    """metadata.csv-driven dataset: columns ``audio``, ``sentence``."""

    def __init__(self, metadata_file: str, data_dir: str, tokenizer=None,
                 extract_args: Optional[Dict[str, Any]] = None,
                 cache: bool = False):
        import pandas as pd
        self.metadata = pd.read_csv(metadata_file)
        self.data_dir = data_dir
        self.tokenizer = tokenizer
        self.extract_args = extract_args or {}
        self._cache: Optional[List] = [None] * len(self.metadata) \
            if cache else None

    def __len__(self):
        return len(self.metadata)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        if self._cache is not None and self._cache[idx] is not None:
            return self._cache[idx]
        row = self.metadata.iloc[idx]
        item = extract_features(
            {"audio": os.path.join(self.data_dir, row["audio"]),
             "transcription": row["sentence"]},
            tokenizer=self.tokenizer, **self.extract_args)
        if self._cache is not None:
            self._cache[idx] = item
        return item


# parity alias (essentials.py:998)
prepare_datasets = PreparedDataset


class SyntheticDataset:
    """Deterministic synthetic utterances: harmonic tones with random
    F0 + token sequences — runs the full pipeline with no audio files
    (the reference's dummy_audio/dummy_text switches, made a fixture)."""

    def __init__(self, n: int = 16, tokenizer=None, seed: int = 0,
                 sample_rate: int = 16000, dur_range=(0.5, 2.0),
                 extract_args: Optional[Dict[str, Any]] = None,
                 sentences: Optional[Sequence[str]] = None):
        self.n = n
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.extract_args = extract_args or {}
        self.rng = np.random.RandomState(seed)
        self.specs = []
        words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
                 "dog", "hello", "world", "speech", "model"]
        for i in range(n):
            rng = np.random.RandomState(seed + i)
            dur = float(rng.uniform(*dur_range))
            f0 = float(rng.uniform(100, 300))
            if sentences is not None:
                text = sentences[i % len(sentences)]
            else:
                text = " ".join(rng.choice(words,
                                           size=rng.randint(2, 8)))
            self.specs.append((dur, f0, text, seed + i))

    def __len__(self):
        return self.n

    def _audio(self, dur, f0, seed):
        sr = self.sample_rate
        t = np.arange(int(sr * dur)) / sr
        rng = np.random.RandomState(seed)
        x = sum((0.5 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t)
                for k in range(3))
        x = x * (0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t))  # AM envelope
        x = x + 0.01 * rng.randn(len(t))
        return (x / np.abs(x).max()).astype(np.float32)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        dur, f0, text, seed = self.specs[idx]
        audio = self._audio(dur, f0, seed)
        return extract_features(
            {"audio": {"array": audio, "sampling_rate": self.sample_rate},
             "transcription": text},
            tokenizer=self.tokenizer, **self.extract_args)


class GrammarDataset:
    """Text-CONDITIONAL synthetic speech from a generative grammar.

    Unlike ``SyntheticDataset`` (random tones per index — only good for
    memorization demos), every lexicon word renders to a fixed
    two-tone acoustic signature and a sentence's audio is the
    concatenation of its words' signatures (plus a short silence and a
    per-utterance noise floor).  Audio is therefore a deterministic
    function of the TEXT: a model that learns the word->signature
    mapping can transcribe sentences it has NEVER seen — the fixture
    behind the held-out generalization evidence (tools/
    demo_generalize.py, docs/GENERALIZATION.md) that the reference's
    evaluation loop measures but never demonstrates (SURVEY §3.4).
    """

    LEXICON = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
               "dog", "hello", "world", "speech", "model"]

    def __init__(self, sentences: Sequence[str], tokenizer=None,
                 extract_args: Optional[Dict[str, Any]] = None,
                 sample_rate: int = 16000, tone_sec: float = 0.12,
                 gap_sec: float = 0.04, noise: float = 0.003,
                 seed: int = 0):
        self.sentences = list(sentences)
        self.tokenizer = tokenizer
        self.extract_args = extract_args or {}
        self.sample_rate = sample_rate
        self.tone_sec = tone_sec
        self.gap_sec = gap_sec
        self.noise = noise
        self.seed = seed
        # per-word signature: two log-spaced frequencies, fixed by the
        # word's lexicon index (deterministic across train/eval)
        rng = np.random.RandomState(1234)
        L = len(self.LEXICON)
        base = 220.0 * (2200.0 / 220.0) ** (np.arange(L) / max(L - 1, 1))
        second = base[rng.permutation(L)]
        self._freqs = {w: (float(base[i]), float(second[i]))
                       for i, w in enumerate(self.LEXICON)}

    @classmethod
    def make_split(cls, n_train: int, n_eval: int, words=(3, 6),
                   seed: int = 0):
        """Disjoint train/eval sentence lists from the grammar: eval
        sentences never appear in train (checked), so eval WER is
        genuine unseen-data generalization."""
        rng = np.random.RandomState(seed)
        seen, train, evals = set(), [], []
        while len(train) < n_train + n_eval:
            k = rng.randint(words[0], words[1] + 1)
            s = " ".join(rng.choice(cls.LEXICON, size=k))
            if s in seen:
                continue
            seen.add(s)
            train.append(s)
        evals = train[n_train:]
        train = train[:n_train]
        assert not set(train) & set(evals)
        return train, evals

    def render(self, text: str, seed: int = 0) -> np.ndarray:
        """Waveform for a sentence — concatenated word signatures."""
        sr = self.sample_rate
        t = np.arange(int(sr * self.tone_sec)) / sr
        gap = np.zeros(int(sr * self.gap_sec), np.float32)
        rng = np.random.RandomState(seed)
        segs = []
        for w in text.split():
            f1, f2 = self._freqs[w]
            for f in (f1, f2):
                x = np.sin(2 * np.pi * f * t) \
                    + 0.3 * np.sin(2 * np.pi * 2 * f * t)
                # 5 ms raised-cosine edges (no clicks -> clean spectra)
                e = int(0.005 * sr)
                env = np.ones_like(x)
                ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(e) / e)
                env[:e] = ramp
                env[-e:] = ramp[::-1]
                segs.append((x * env).astype(np.float32))
            segs.append(gap)
        audio = np.concatenate(segs[:-1]) if segs else np.zeros(1, np.float32)
        audio = audio + self.noise * rng.randn(len(audio)).astype(np.float32)
        return (audio / np.abs(audio).max()).astype(np.float32)

    def __len__(self):
        return len(self.sentences)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        text = self.sentences[idx]
        audio = self.render(text, seed=self.seed + idx)
        return extract_features(
            {"audio": {"array": audio, "sampling_rate": self.sample_rate},
             "transcription": text},
            tokenizer=self.tokenizer, **self.extract_args)


def data_loader(dataset, batch_size: int = 1, shuffle: bool = False,
                seed: int = 0, pad_to_multiple: Optional[int] = None,
                text_pad_to_multiple: Optional[int] = None,
                with_masks: bool = False, drop_last: bool = False
                ) -> Iterator[Dict[str, np.ndarray]]:
    """Collated numpy batch iterator (single pass)."""
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for start in range(0, len(idx), batch_size):
        sel = idx[start:start + batch_size]
        if drop_last and len(sel) < batch_size:
            return
        feats = [dataset[int(i)] for i in sel]
        yield collate(feats, pad_to_multiple=pad_to_multiple,
                      text_pad_to_multiple=text_pad_to_multiple,
                      with_masks=with_masks)


class Prefetcher:
    """Thread-backed prefetching wrapper over any batch iterable —
    feature extraction (host) overlaps the device train step (the
    reference's num_workers=0 DataLoader is fully synchronous,
    SURVEY §3.1)."""

    def __init__(self, iterable, depth: int = 2):
        self.iterable = iterable
        self.depth = depth

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()

        def worker():
            try:
                for item in self.iterable:
                    q.put(item)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                return
            yield item


class Repeated:
    """Re-iterable view over data_loader for multi-epoch training."""

    def __init__(self, dataset, **kw):
        self.dataset = dataset
        self.kw = kw

    def __iter__(self):
        return data_loader(self.dataset, **self.kw)

    def __len__(self):
        bs = self.kw.get("batch_size", 1)
        return (len(self.dataset) + bs - 1) // bs


def random_split(dataset, train_frac: float = 0.8, seed: int = 0):
    """80/20 split parity (model.py:749-751)."""
    n = len(dataset)
    idx = np.arange(n)
    np.random.RandomState(seed).shuffle(idx)
    cut = int(train_frac * n)
    return (_Subset(dataset, idx[:cut]), _Subset(dataset, idx[cut:]))


class _Subset:
    def __init__(self, ds, idx):
        self.ds = ds
        self.idx = list(idx)

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i):
        return self.ds[int(self.idx[i])]
