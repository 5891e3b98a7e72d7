"""Batch collation.

Parity: DataCollator essentials.py:523-574 — labels become BOS-prefixed
``text_ids`` and EOS-suffixed ``labels``, both padded with PAD=0 to
(batch max + 1); feature tensors are zero-padded on the last (time)
axis and stacked.

TPU addition: optional ``pad_to_multiple`` rounds padded lengths up so
jit sees a small set of static shapes (length bucketing), and the
collator can emit validity masks (``text_mask``, per-feature frame
masks) for the strict-masking execution mode.  With
``pad_to_multiple=None`` and ``with_masks=False`` the output matches
the reference byte-for-byte.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

FEATURE_KEYS = ("spectrogram", "waveform", "pitch", "pitch_tokens")


def _round_up(n: int, m: Optional[int]) -> int:
    if not m:
        return n
    return ((n + m - 1) // m) * m


@dataclass
class DataCollator:
    tokenizer: Any = None
    pad_token_id: int = 0
    bos_token_id: int = 1
    eos_token_id: int = 2
    pad_to_multiple: Optional[int] = None
    text_pad_to_multiple: Optional[int] = None
    with_masks: bool = False

    def __call__(self, features: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        return collate(features, pad_token_id=self.pad_token_id,
                       bos_token_id=self.bos_token_id,
                       eos_token_id=self.eos_token_id,
                       pad_to_multiple=self.pad_to_multiple,
                       text_pad_to_multiple=self.text_pad_to_multiple,
                       with_masks=self.with_masks)


def collate(features: List[Dict[str, Any]], pad_token_id: int = 0,
            bos_token_id: int = 1, eos_token_id: int = 2,
            pad_to_multiple: Optional[int] = None,
            text_pad_to_multiple: Optional[int] = None,
            with_masks: bool = False) -> Dict[str, np.ndarray]:
    batch: Dict[str, np.ndarray] = {}
    all_keys = set()
    for f in features:
        all_keys.update(f.keys())

    if "labels" in all_keys:
        labels_list = [list(np.asarray(f["labels"]).tolist())
                       for f in features]
        max_len = max(len(l) for l in labels_list)
        tmult = (text_pad_to_multiple if text_pad_to_multiple is not None
                 else pad_to_multiple)
        tgt = _round_up(max_len + 1, tmult)
        all_ids, all_labels, mask = [], [], []
        for label in labels_list:
            dec_in = [bos_token_id] + label
            lab_eos = label + [eos_token_id]
            all_ids.append(dec_in + [pad_token_id] * (tgt - len(dec_in)))
            all_labels.append(lab_eos + [pad_token_id] * (tgt - len(lab_eos)))
            mask.append([1] * len(dec_in) + [0] * (tgt - len(dec_in)))
        batch["text_ids"] = np.asarray(all_ids, dtype=np.int64)
        batch["labels"] = np.asarray(all_labels, dtype=np.int64)
        if with_masks:
            batch["text_mask"] = np.asarray(mask, dtype=np.bool_)

    for key in FEATURE_KEYS:
        if key not in all_keys:
            continue
        items = [np.asarray(f[key]) for f in features
                 if key in f and f[key] is not None]
        if not items:
            continue
        max_len = _round_up(max(it.shape[-1] for it in items),
                            pad_to_multiple)
        padded, masks = [], []
        for it in items:
            pad_width = max_len - it.shape[-1]
            if pad_width > 0:
                widths = [(0, 0)] * (it.ndim - 1) + [(0, pad_width)]
                padded.append(np.pad(it, widths, constant_values=pad_token_id))
            else:
                padded.append(it)
            masks.append([1] * it.shape[-1] + [0] * pad_width)
        batch[key] = np.stack(padded)
        if with_masks:
            batch[f"{key}_mask"] = np.asarray(masks, dtype=np.bool_)

    return batch
