"""LibriSpeech corpus access.

Parity target: librispeech_asr.py:31-143 — an HF ``datasets`` builder
that downloads the OpenSLR tarballs (http://www.openslr.org/resources/12/),
globs ``*.trans.txt`` + ``*.flac`` and yields
``{file, audio, text, speaker_id, chapter_id, id}`` examples for the
clean splits.

This module provides the same three layers:

* ``LIBRISPEECH_URLS`` / ``download_and_extract`` — the acquisition
  step (requires network; gated, everything below works on a local
  extracted tree);
* ``iter_librispeech_split(root)`` — walk an extracted
  ``LibriSpeech/<split>`` tree, parse the ``<spk>-<chap>.trans.txt``
  transcript files and yield the reference's example dict;
* ``LibriSpeechDataset`` — map-style dataset running the full
  feature-extraction pipeline per example (the equivalent of
  prepare_datasets over metadata.csv, essentials.py:998-1026), with
  optional caching.

Malformed entries are skipped with warnings, matching the reference's
defensive loader (librispeech_asr.py:110-143).
"""

from __future__ import annotations

import logging
import os
import tarfile
import urllib.request
from typing import Any, Dict, Iterator, List, Optional

logger = logging.getLogger(__name__)

_BASE = "http://www.openslr.org/resources/12/"
LIBRISPEECH_URLS = {
    "dev-clean": _BASE + "dev-clean.tar.gz",
    "test-clean": _BASE + "test-clean.tar.gz",
    "train-clean-100": _BASE + "train-clean-100.tar.gz",
    "train-clean-360": _BASE + "train-clean-360.tar.gz",
    "dev-other": _BASE + "dev-other.tar.gz",
    "test-other": _BASE + "test-other.tar.gz",
    "train-other-500": _BASE + "train-other-500.tar.gz",
}


def download_and_extract(split: str, cache_dir: str) -> str:
    """Fetch + extract one split; returns the split directory.  No-op
    when already extracted."""
    os.makedirs(cache_dir, exist_ok=True)
    out_dir = os.path.join(cache_dir, "LibriSpeech", split)
    if os.path.isdir(out_dir):
        return out_dir
    url = LIBRISPEECH_URLS[split]
    tar_path = os.path.join(cache_dir, os.path.basename(url))
    if not os.path.exists(tar_path):
        logger.info("downloading %s", url)
        urllib.request.urlretrieve(url, tar_path)
    with tarfile.open(tar_path, "r:gz") as tf:
        tf.extractall(cache_dir)
    return out_dir


def iter_librispeech_split(split_dir: str) -> Iterator[Dict[str, Any]]:
    """Yield {file, text, speaker_id, chapter_id, id} from an extracted
    split tree (audio decode is deferred to the dataset)."""
    for dirpath, _dirnames, filenames in sorted(os.walk(split_dir)):
        for fname in sorted(filenames):
            if not fname.endswith(".trans.txt"):
                continue
            trans_path = os.path.join(dirpath, fname)
            with open(trans_path, encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    parts = line.split(" ", 1)
                    if len(parts) != 2:
                        logger.warning("malformed transcript line in %s: %r",
                                       trans_path, line[:80])
                        continue
                    utt_id, text = parts
                    ids = utt_id.split("-")
                    if len(ids) < 3:
                        logger.warning("malformed utterance id %r", utt_id)
                        continue
                    audio = None
                    for ext in (".flac", ".wav"):
                        cand = os.path.join(dirpath, utt_id + ext)
                        if os.path.exists(cand):
                            audio = cand
                            break
                    if audio is None:
                        logger.warning("missing audio for %s", utt_id)
                        continue
                    yield {
                        "file": audio,
                        "text": text,
                        "speaker_id": int(ids[0]),
                        "chapter_id": int(ids[1]),
                        "id": utt_id,
                    }


class LibriSpeechDataset:
    """Map-style dataset over an extracted split; per-example feature
    extraction like prepare_datasets (essentials.py:998-1026)."""

    def __init__(self, split_dir: str, tokenizer=None,
                 extract_args: Optional[Dict[str, Any]] = None,
                 cache: bool = False, limit: Optional[int] = None):
        from asr_model_tpu.data.features import extract_features
        self._extract = extract_features
        self.examples: List[Dict[str, Any]] = list(
            iter_librispeech_split(split_dir))
        if limit:
            self.examples = self.examples[:limit]
        self.tokenizer = tokenizer
        self.extract_args = extract_args or {}
        self._cache: Optional[List] = [None] * len(self.examples) \
            if cache else None

    def __len__(self):
        return len(self.examples)

    def __getitem__(self, idx: int):
        if self._cache is not None and self._cache[idx] is not None:
            return self._cache[idx]
        ex = self.examples[idx]
        item = self._extract({"audio": ex["file"],
                              "transcription": ex["text"]},
                             tokenizer=self.tokenizer, **self.extract_args)
        if self._cache is not None:
            self._cache[idx] = item
        return item


def load_dataset(split: str = "dev-clean", cache_dir: str = "./cache",
                 tokenizer=None, extract_args=None, **kw):
    """Parity-flavoured entry: download (if needed) + dataset."""
    split_dir = download_and_extract(split, cache_dir)
    return LibriSpeechDataset(split_dir, tokenizer=tokenizer,
                              extract_args=extract_args, **kw)
